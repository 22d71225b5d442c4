"""`python -m letarette_spark` — the lrcli-analog entry point (cli.py)."""

import sys

from letarette_spark.cli import main

sys.exit(main())
