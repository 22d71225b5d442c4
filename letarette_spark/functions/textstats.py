"""Text analysis operators: quality scoring, token counting, language ID,
document fingerprinting. JVM-side column expressions throughout."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array

# Built-in stopword profiles for the language heuristic: the most common
# function words per language, restricted to ASCII tokens of length >= 2
# (the simple analyzer lowercases and splits on [^a-z0-9]+, so accented or
# single-letter function words can never appear as tokens).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "of", "and", "in", "to", "is", "was", "for", "as", "on",
           "with", "by", "at", "from", "that", "it", "this", "are", "be", "or"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "im", "dem", "des", "auf", "als", "auch", "es",
           "an", "sich"],
    "fr": ["le", "la", "les", "de", "et", "est", "dans", "pour", "que",
           "une", "un", "du", "des", "en", "au", "il", "qui", "pas", "sur",
           "avec"],
    "es": ["el", "la", "los", "las", "de", "en", "que", "es", "un", "una",
           "por", "con", "para", "del", "se", "no", "su", "al", "como",
           "lo"],
    "it": ["il", "la", "le", "di", "che", "in", "un", "una", "per", "con",
           "del", "della", "si", "non", "sono", "da", "come", "anche",
           "ma", "nel"],
    "pt": ["os", "as", "de", "que", "em", "um", "uma", "para", "com",
           "nao", "do", "da", "no", "na", "por", "se", "mais", "dos",
           "como", "mas"],
    "nl": ["de", "het", "een", "en", "van", "in", "is", "dat", "op", "te",
           "zijn", "met", "voor", "niet", "aan", "er", "ook", "als", "bij",
           "maar"],
    "sv": ["och", "att", "det", "som", "en", "av", "den", "till",
           "inte", "om", "har", "de", "ett", "han", "var", "jag", "med",
           "man", "efter", "vid"],
    # da/no are close cousins of sv and each other; their profiles lean
    # on the divergent function words (da efter/mellem/uden/hvad/blev vs
    # no etter/mellom/uten/hva/ble) so the trigram tables separate them
    "da": ["og", "at", "det", "som", "en", "af", "den", "til", "ikke",
           "om", "har", "de", "et", "han", "var", "jeg", "med", "man",
           "efter", "ved"],
    "no": ["og", "at", "det", "som", "en", "av", "den", "til", "ikke",
           "om", "har", "de", "et", "han", "var", "jeg", "med", "man",
           "etter", "ved"],
    "fi": ["ja", "on", "ei", "se", "etta", "oli", "joka", "mutta", "kun",
           "niin", "ovat", "mukaan", "myos", "jos", "vain", "voi", "kuin",
           "seka", "tai", "sita"],
    "pl": ["nie", "jest", "sie", "na", "do", "ze", "jak", "ale", "czy",
           "tak", "juz", "tylko", "byl", "sa", "ma", "przez", "dla",
           "oraz", "tego", "tym"],
}

STOPWORDS_EN = LANG_PROFILES["en"]

# Extended per-language word lists feeding the char-trigram profiles
# (round-3 verdict task #8: promote lang_id one fidelity notch). ASCII
# only — the simple analyzer lowercases and splits on [^a-z0-9]+, so
# accented forms arrive folded or split; lists are pre-folded the same
# way. ~45 high-frequency words per language: the 20 function words above
# plus frequent verbs/pronouns/nouns.
LANG_WORDS: dict[str, list[str]] = {
    "en": LANG_PROFILES["en"] + [
        "have", "has", "not", "but", "they", "his", "her", "which", "were",
        "been", "their", "more", "when", "who", "will", "would", "there",
        "what", "about", "into", "than", "them", "can", "only", "other",
    ],
    "de": LANG_PROFILES["de"] + [
        "wurde", "werden", "wird", "einer", "einem", "einen", "zum", "zur",
        "bei", "aus", "nach", "wie", "ueber", "fuer", "sind", "war",
        "haben", "hat", "noch", "aber", "oder", "wenn", "durch", "unter",
        "zwischen",
    ],
    "fr": LANG_PROFILES["fr"] + [
        "par", "plus", "ont", "ete", "sont", "aux", "ses", "mais", "comme",
        "elle", "tout", "nous", "deux", "ans", "entre", "aussi", "bien",
        "apres", "ces", "cette", "fait", "ils", "leur", "sans", "peut",
    ],
    "es": LANG_PROFILES["es"] + [
        "fue", "ser", "son", "tiene", "entre", "cuando", "todo", "esta",
        "ese", "tambien", "hasta", "hay", "donde", "quien", "desde",
        "nos", "durante", "todos", "uno", "les", "muy", "anos", "dos",
        "pero", "sobre",
    ],
    "it": LANG_PROFILES["it"] + [
        "alla", "nella", "sua", "dei", "delle", "gli", "era", "sono",
        "piu", "questo", "questa", "hanno", "essere", "stato", "dopo",
        "dove", "quando", "tra", "suo", "loro", "fino", "due", "anni",
        "molto", "tutti",
    ],
    "pt": LANG_PROFILES["pt"] + [
        "foi", "ser", "tem", "seu", "sua", "ou", "quando", "muito", "ja",
        "tambem", "so", "pelo", "pela", "ate", "isso", "ela", "entre",
        "depois", "sem", "mesmo", "aos", "seus", "quem", "nas", "esse",
    ],
    "nl": LANG_PROFILES["nl"] + [
        "naar", "uit", "over", "hij", "zij", "werd", "worden", "wordt",
        "door", "nog", "wel", "geen", "tot", "deze", "onder", "tussen",
        "heeft", "hebben", "was", "waren", "dit", "hun", "meer", "jaar",
        "twee",
    ],
    "sv": LANG_PROFILES["sv"] + [
        "fran", "under", "ocksa", "nar", "dar", "kan", "ska", "skulle",
        "denna", "detta", "hon", "honom", "hennes", "hans", "sig", "sin",
        "sitt", "blev", "blir", "vara", "varit", "mellan", "genom", "utan",
        "mot",
        # distinctly-Swedish vs the no/da cousins ("ar" = folded "är" vs
        # their "er"; sedan/bara/mycket/manga have no no/da twins)
        "ar", "nu", "sedan", "bara", "mycket", "alla", "andra", "hela",
        "manga", "sjalv", "sitter", "finns",
    ],
    "da": LANG_PROFILES["da"] + [
        "hvor", "hvad", "hvem", "kan", "skal", "skulle", "ville", "hun",
        "hende", "hendes", "hans", "sig", "sin", "sit", "blev", "bliver",
        "mellem", "gennem", "uden", "mod", "eller", "denne", "dette",
        "noget", "meget",
    ],
    "no": LANG_PROFILES["no"] + [
        "hvor", "hva", "hvem", "kan", "skal", "skulle", "ville", "hun",
        "henne", "hennes", "hans", "seg", "sin", "sitt", "ble", "blir",
        "mellom", "gjennom", "uten", "mot", "eller", "denne", "dette",
        "noe", "mye",
    ],
    "fi": LANG_PROFILES["fi"] + [
        "talla", "ennen", "jalkeen", "kanssa", "ilman", "koska", "siella",
        "paljon", "kaikki", "jotka", "olivat", "hanen", "heidan", "itse",
        "sitten", "nyt", "viela", "ollut", "olla", "taman", "niista",
        "jossa", "mitaan", "mika", "hyvin",
    ],
    "pl": LANG_PROFILES["pl"] + [
        "byla", "bylo", "byly", "mial", "przy", "jego", "jej", "ich",
        "ktory", "ktora", "ktore", "bardzo", "moze", "takze", "wszystko",
        "jeszcze", "kiedy", "gdzie", "pod", "nad", "bez", "przed", "tych",
        "innych", "roku",
    ],
}


def _trigram_profile(words: list[str], n: int = 200) -> list[str]:
    """Deterministic char-trigram table: padded-word trigrams ranked by
    (frequency desc, trigram asc), truncated to n — every profile the
    same size so cross-language hit counts compare fairly."""
    from collections import Counter

    c: Counter = Counter()
    for w in words:
        p = f"_{w}_"
        for i in range(len(p) - 2):
            c[p[i : i + 3]] += 1
    return [t for t, _cnt in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:n]]


LANG_TRIGRAMS: dict[str, list[str]] = {
    lang: _trigram_profile(ws) for lang, ws in LANG_WORDS.items()
}


def _trigram_tiers(
    profiles: dict[str, list[str]]
) -> dict[str, list[list[str]]]:
    """Share-weighted profiles as WEIGHT TIERS. A trigram in only one
    language's profile weighs len(langs); one in every profile weighs 1
    (weight = n_langs + 1 - share). Expressing the weight as nested
    tiers — tiers[k] = trigrams with weight > k — keeps the scoring a
    plain sum of count-hits-in-list passes, the exact shape both the
    Spark JVM expression and the DuckDB oracle twin already use:
    score = Σ_k |doc trigrams ∩ tiers[k]| (with multiplicity).

    The down-weighting separates close cousins (sv/no/da, es/pt): the
    pan-Scandinavian trigrams every profile shares stop outvoting the
    few genuinely distinctive ones."""
    from collections import Counter

    share = Counter(t for tris in profiles.values() for t in set(tris))
    n_langs = len(profiles)
    tiers = {}
    for lang, tris in profiles.items():
        per = [
            [t for t in tris if n_langs + 1 - share[t] >= k]
            for k in range(1, n_langs + 1)
        ]
        tiers[lang] = [tt for tt in per if tt]
    return tiers


LANG_TRIGRAM_TIERS: dict[str, list[list[str]]] = _trigram_tiers(LANG_TRIGRAMS)


def token_count_expr(text_col: str = "text") -> Column:
    return F.size(token_array(text_col)).cast("long")


def bpe_ish_token_count_expr(text_col: str = "text") -> Column:
    """Approximate subword count: word-piece-ish regex segmentation
    (letter-runs, digit-runs, single punctuation) — a cheap proxy for BPE
    token counting in data pipelines."""
    pieces = F.filter(
        F.split(
            F.regexp_replace(F.col(text_col), r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", "$1 "),
            " ",
        ),
        lambda x: F.trim(x) != "",
    )
    return F.size(pieces).cast("long")


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features: length, token stats, stopword/digit/punct
    ratios — the standard pretraining-data quality gates."""
    arr = token_array(text_col)
    n_tok = F.size(arr).cast("double")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(arr, lambda t: F.array_contains(sw, t))).cast("double")
    n_digit = F.size(F.filter(arr, lambda t: t.rlike("^[0-9]+$"))).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    n_alnum_sp = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    ).cast("double")
    avg_len = F.when(
        n_tok > 0,
        F.aggregate(arr, F.lit(0.0), lambda a, t: a + F.length(t)) / n_tok,
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_measured"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0), 6).alias("stopword_ratio"),
        F.round(F.when(n_tok > 0, n_digit / n_tok).otherwise(0.0), 6).alias("digit_ratio"),
        F.round(
            F.when(n_chars > 0, (n_chars - n_alnum_sp) / n_chars).otherwise(0.0), 6
        ).alias("punct_ratio"),
    )


def doc_trigrams_expr(text_col: str = "text") -> Column:
    """Padded per-token char trigrams of the analyzed tokens ('_the_' ->
    _th, the, he_), with multiplicity — pure JVM array expressions."""
    arr = token_array(text_col)

    def tri(t):
        padded = F.concat(F.lit("_"), t, F.lit("_"))
        return F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: padded.substr(i, F.lit(3)),
        )

    return F.flatten(F.transform(arr, tri))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Char-trigram language guess over 12 languages: the language whose
    SHARE-WEIGHTED trigram profile (LANG_TRIGRAM_TIERS — 200 padded-word
    trigrams per language from ~45 high-frequency words, each trigram
    weighted by how few profiles share it) scores the most document
    trigrams, counted with multiplicity. Ties -> lexicographically
    first; score 0 -> 'und'.

    Heuristic-grade fidelity by design (documented in COVERAGE.md): the
    gate pins determinism via a value-exact DuckDB twin, and a labeled
    mini-set pins >=90% accuracy including the es/pt and no/da confusion
    pairs. One scan, pure JVM expressions (a handful of
    count-hits-in-tier array passes per language) — the 100-TB plan is
    unchanged."""
    tris = doc_trigrams_expr(text_col)
    langs = sorted(LANG_TRIGRAM_TIERS)
    hits = []
    for i, lang in enumerate(langs):
        score = None
        for tier in LANG_TRIGRAM_TIERS[lang]:
            tl = F.array(*[F.lit(t) for t in tier])
            c = F.size(F.filter(tris, lambda t: F.array_contains(tl, t)))
            score = c if score is None else score + c
        hits.append(
            F.struct(
                score.alias("hits"),
                # ties resolve to the lexicographically-first language:
                # higher priority = earlier lang, so max() picks it.
                F.lit(len(langs) - 1 - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*hits))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        best["hits"].cast("long").alias("trigram_hits"),
    )


def gopher_quality_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/C4-style document quality gates (the published pretraining
    filter rules), computed as pure column expressions in one scan:

      n_words            whitespace-delimited words
      mean_word_len      average word length
      frac_alpha_words   fraction of words containing a letter
      bullet_line_frac   fraction of lines starting with '-' or '*'
      ellipsis_line_frac fraction of lines ending with '...'
      dup_line_frac      1 - distinct/total over non-empty lines
      passes             the conjunction of the standard thresholds:
                         50 <= n_words <= 100000, 3 <= mean_word_len <= 10,
                         frac_alpha_words >= 0.8, bullet <= 0.9,
                         ellipsis <= 0.3, dup_line_frac <= 0.3
    """
    # explicit whitespace class: Java's \s and RE2's \s disagree on \x0B,
    # and the DuckDB oracle twin must split identically
    words = F.filter(
        F.split(F.col(text_col), "[ \t\n\x0b\f\r]+"), lambda w: F.length(w) > 0
    )
    n_words = F.size(words).cast("double")
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0.0), lambda a, w: a + F.length(w)) / n_words,
    ).otherwise(0.0)
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("double")
    frac_alpha = F.when(n_words > 0, alpha / n_words).otherwise(0.0)

    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), F.trim),
        lambda l: F.length(l) > 0,
    )
    n_lines = F.size(lines).cast("double")
    bullet = F.size(
        F.filter(lines, lambda l: l.startswith("-") | l.startswith("*"))
    ).cast("double")
    ellipsis = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double")
    n_distinct = F.size(F.array_distinct(lines)).cast("double")
    bullet_frac = F.when(n_lines > 0, bullet / n_lines).otherwise(0.0)
    ellipsis_frac = F.when(n_lines > 0, ellipsis / n_lines).otherwise(0.0)
    dup_frac = F.when(n_lines > 0, 1.0 - n_distinct / n_lines).otherwise(0.0)

    passes = (
        (n_words >= 50) & (n_words <= 100000)
        & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (frac_alpha >= 0.8)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (dup_frac <= 0.3)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(frac_alpha, 6).alias("frac_alpha_words"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(dup_frac, 6).alias("dup_line_frac"),
        passes.alias("passes"),
    )


def fingerprint64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-sensitive 62-bit document fingerprint: two polynomial rolling
    hashes (Horner, multipliers 31/37, modulus 2^31-1, ANSI-safe — no
    wrapping arithmetic) over a 32-bit md5-derived hash of each token,
    packed into one long. md5 (not xxhash64) keeps every step computable
    in any SQL engine, so the operator is oracle-checkable. Distinguishes
    reordered content where bag-of-words hashes collide."""
    arr = token_array(text_col)
    p = F.lit(2147483647).cast("long")  # 2^31 - 1

    def tok_hash(t, salt: str):
        # first 8 md5 hex chars -> [0, 2^32): non-negative, so % == pmod
        return F.conv(
            F.substring(F.md5(F.concat(t, F.lit(salt))), 1, 8), 16, 10
        ).cast("long") % p

    def rolling(mult: int, salt: str):
        return F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, t: F.pmod(acc * mult + tok_hash(t, salt), p),
        )

    fp = rolling(31, "") * F.lit(2147483648).cast("long") + rolling(37, "#2")
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def _ngram_array(arr, n: int):
    """array<string> of space-joined n-grams over a token array, document
    order; docs shorter than n yield an empty array."""
    idx = F.when(
        F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(arr, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )


def _tag_ngrams(ng, n: int):
    """array<struct<n,ng>> tagging each n-gram with its n."""
    return F.transform(
        ng, lambda g: F.struct(F.lit(n).alias("n"), g.alias("ng"))
    )


def repetition_scores(
    df: DataFrame,
    ns: tuple[int, ...] = (2, 3, 4),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style within-document repetition signals, per n in *ns*:

      dup_{n}gram_frac      1 - distinct/total n-grams (count-based)
      top_{n}gram_char_frac characters covered by the single most frequent
                            n-gram (occurrences × its token chars) over
                            the document's total token characters

    (Rae et al., "Scaling Language Models: ... Gopher", Table A1 — the
    repetition filters; dup-line signals live in gopher_quality_flags.)

    The top n-gram per doc needs a per-group argmax with a DETERMINISTIC
    tie-break (count desc, char length desc, n-gram text desc — mirrored
    exactly by the DuckDB twin). All |ns| signals ride ONE tokenize scan:
    the per-n n-gram arrays are flattened into a single (n, ngram) struct
    array, exploded ONCE (explode_outer, so n-gram-free docs survive),
    counted by (doc, n, ngram) in one partial-agg shuffle, argmax'd by a
    (doc, n) row_number window, and folded back to one row per doc in a
    final groupBy — linear, skew-free (a doc contributes ~|ns|·doc_len
    rows). The dup fractions are pure per-row array math carried through
    the same rows (identical within a doc, so first() is exact)."""
    from pyspark.sql import Window

    arr = token_array(text_col)
    tok_chars = F.aggregate(arr, F.lit(0), lambda a, t: a + F.length(t))
    base_cols = [F.col(id_col), tok_chars.alias("__chars")]
    pair_arrays = []
    for n in ns:
        ng = _ngram_array(arr, n)
        total = F.size(ng)
        dup = F.when(
            total > 0,
            1.0 - F.size(F.array_distinct(ng)).cast("double") / total.cast("double"),
        ).otherwise(F.lit(0.0))
        base_cols.append(F.round(dup, 6).alias(f"dup_{n}gram_frac"))
        # single-arg lambda: a 2-arg transform lambda binds the array
        # INDEX as the 2nd param (CLAUDE.md), clobbering a `_n=n` default
        pair_arrays.append(_tag_ngrams(ng, n))
    base_cols.append(F.flatten(F.array(*pair_arrays)).alias("__pairs"))
    base = df.select(*base_cols)

    dup_cols = [f"dup_{n}gram_frac" for n in ns]
    flat = base.select(
        id_col,
        "__chars",
        *dup_cols,
        F.explode_outer("__pairs").alias("__p"),
    ).select(
        id_col,
        "__chars",
        *dup_cols,
        F.col("__p.n").alias("__n"),
        F.col("__p.ng").alias("__ng"),
    )
    grouped = (
        flat.groupBy(id_col, "__n", "__ng")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.first("__chars").alias("__chars"),
            *[F.first(c).alias(c) for c in dup_cols],
        )
        .withColumn(
            "__nglen", F.length(F.regexp_replace(F.col("__ng"), " ", ""))
        )
    )
    w = Window.partitionBy(id_col, "__n").orderBy(
        F.desc("__cnt"), F.desc("__nglen"), F.desc("__ng")
    )
    out = (
        grouped.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy(id_col)
        .agg(
            F.first("__chars").alias("__chars"),
            *[F.first(c).alias(c) for c in dup_cols],
            *[
                F.max(
                    F.when(
                        F.col("__n") == n,
                        F.col("__cnt") * F.col("__nglen"),
                    )
                ).alias(f"__topchars_{n}")
                for n in ns
            ],
        )
    )
    sel = [F.col(id_col)] + [F.col(f"dup_{n}gram_frac") for n in ns]
    for n in ns:
        sel.append(
            F.round(
                F.when(
                    F.col("__chars") > 0,
                    F.coalesce(F.col(f"__topchars_{n}"), F.lit(0)).cast("double")
                    / F.col("__chars").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"top_{n}gram_char_frac")
        )
    return out.select(*sel)
