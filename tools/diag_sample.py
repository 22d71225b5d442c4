"""Sample where concurrent query workers actually spend their time.

Attaches to every running java/python process spawned by diag_conc
workers and samples, once per second: thread states (R/S/D counts),
top wchan values for D/S threads, aggregate utime/stime deltas, and
/proc/diskstats for vda (IO in flight, read/write sectors). Prints a
compact line per tick; run alongside `diag_conc --run-worker query`
instances (or any concurrent-worker experiment) to separate CPU, disk
wait, and lock wait."""

from __future__ import annotations

import collections
import os
import sys
import time


def pids_of_interest() -> list[int]:
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("latin-1")
        except OSError:
            continue
        if "diag_q" in cmd or ("java" in cmd and "local[" in cmd) or \
                "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            out.append(int(pid))
    return out


def sample_threads(pids):
    states = collections.Counter()
    wchans = collections.Counter()
    cpu = 0
    for pid in pids:
        tdir = f"/proc/{pid}/task"
        try:
            tids = os.listdir(tdir)
        except OSError:
            continue
        for tid in tids:
            try:
                with open(f"{tdir}/{tid}/stat") as f:
                    f2 = f.read().rsplit(")", 1)[1].split()
                st = f2[0]
                states[st] += 1
                cpu += int(f2[11]) + int(f2[12])  # utime+stime ticks
                if st == "D":
                    with open(f"{tdir}/{tid}/wchan") as f:
                        wchans["D:" + f.read().strip()] += 1
            except OSError:
                continue
    return states, wchans, cpu


def diskstats(dev="vda"):
    with open("/proc/diskstats") as f:
        for line in f:
            p = line.split()
            if p[2] == dev:
                return {
                    "rsect": int(p[5]), "wsect": int(p[9]),
                    "inflight": int(p[11]), "io_ms": int(p[12]),
                }
    return {}


def main():
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    prev_cpu = None
    prev_disk = diskstats()
    t_end = time.time() + duration
    while time.time() < t_end:
        pids = pids_of_interest()
        states, wchans, cpu = sample_threads(pids)
        disk = diskstats()
        d_cpu = (cpu - prev_cpu) / 100.0 if prev_cpu is not None else 0.0
        d_r = (disk["rsect"] - prev_disk["rsect"]) * 512 // 1024
        d_w = (disk["wsect"] - prev_disk["wsect"]) * 512 // 1024
        d_io = disk["io_ms"] - prev_disk["io_ms"]
        prev_cpu, prev_disk = cpu, disk
        top_w = ",".join(f"{k}x{v}" for k, v in wchans.most_common(3))
        print(
            f"procs={len(pids)} R={states.get('R',0)} D={states.get('D',0)} "
            f"S={states.get('S',0)} cpu={d_cpu:.1f}cores "
            f"rd={d_r}KB wr={d_w}KB io_busy={d_io}ms {top_w}",
            flush=True,
        )
        time.sleep(1)


if __name__ == "__main__":
    main()
