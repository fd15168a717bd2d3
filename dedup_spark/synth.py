"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Produces the BASELINE.json ``input_hint`` table shape:
``(repo, path, commit, lang, content)`` plus a ground-truth sidecar
``(file_id, cluster_gt)`` for recall measurement.

Near-dup clusters are injected with labeled transforms:
  exact copy · single-line insert/delete/edit · block reorder ·
  license-header prepend · cross-repo vendored copy.
Cluster sizes are power-law (one giant cluster >= 5% of files) to
exercise LSH band skew. Seed-stable: same (seed, n_files) -> same corpus.
"""

from __future__ import annotations

import hashlib
import random

LANGS = ["go", "py", "java", "js", "c"]

_KEYWORDS = {
    "go": ("func", "return", "package", "var", "type", "struct"),
    "py": ("def", "return", "import", "class", "self", "lambda"),
    "java": ("public", "return", "class", "static", "void", "final"),
    "js": ("function", "return", "const", "let", "class", "async"),
    "c": ("int", "return", "static", "struct", "void", "char"),
}

_IDENT = ("buf", "idx", "hash", "block", "chunk", "size", "data", "off",
          "count", "state", "node", "edge", "sig", "band", "score", "token")

_LICENSE = (
    "// Copyright (c) 2015 The Authors. All rights reserved.\n"
    "// Use of this source code is governed by a MIT-style license.\n\n"
)


def _gen_line(rng: random.Random, lang: str) -> str:
    kw = rng.choice(_KEYWORDS[lang])
    a, b = rng.choice(_IDENT), rng.choice(_IDENT)
    k = rng.randrange(1000)
    forms = [
        f"{kw} {a}_{k}({b}) {{ return {a} * {k} + {b}; }}",
        f"    {a} = {b}[{k} % len({b})]",
        f"{kw} {a}{k} = compute_{b}({a}, {k})",
        f"    if {a} > {k}: {b} += {a} << 2",
        f"    for i := range {a} {{ {b}[i] = uint32({k}) }}",
        f"/* {a} {b} {k} */",
    ]
    return forms[rng.randrange(len(forms))]


def _gen_file(rng: random.Random, lang: str, n_lines: int) -> str:
    return "\n".join(_gen_line(rng, lang) for _ in range(n_lines)) + "\n"


def _mutate(rng: random.Random, content: str, kind: str) -> str:
    lines = content.split("\n")
    if kind == "exact":
        return content
    if kind == "insert":
        i = rng.randrange(len(lines))
        lines.insert(i, _gen_line(rng, rng.choice(LANGS)))
    elif kind == "delete" and len(lines) > 3:
        del lines[rng.randrange(len(lines))]
    elif kind == "edit":
        i = rng.randrange(len(lines))
        lines[i] = _gen_line(rng, rng.choice(LANGS))
    elif kind == "reorder" and len(lines) > 8:
        n = len(lines) // 4
        i = rng.randrange(len(lines) - 2 * n)
        lines = lines[:i] + lines[i + n:i + 2 * n] + lines[i:i + n] + lines[i + 2 * n:]
    elif kind == "license":
        return _LICENSE + content
    return "\n".join(lines)


_TRANSFORMS = ["exact", "insert", "delete", "edit", "reorder", "license", "vendored"]


def generate_corpus(n_files: int, seed: int = 42, dup_fraction: float = 0.4):
    """Return list of row dicts: repo, path, commit, lang, content, cluster_gt.

    ``cluster_gt`` is the ground-truth near-dup cluster id; singletons get a
    unique negative-free id of their own (cluster of size 1).
    """
    rng = random.Random(seed)
    n_dup = int(n_files * dup_fraction)
    n_base = n_files - n_dup

    rows = []
    cluster_id = 0

    def emit(content: str, lang: str, cluster: int, vendored: bool = False):
        i = len(rows)
        org = rng.randrange(20) if not vendored else rng.randrange(20, 40)
        rows.append({
            "repo": f"org{org}/proj{rng.randrange(50)}",
            "path": f"src/pkg{rng.randrange(30)}/file{i}.{lang}",
            "commit": hashlib.sha1(f"{seed}:{i}".encode()).hexdigest(),
            "lang": lang,
            "content": content,
            "cluster_gt": cluster,
        })

    # Base singleton files.
    for _ in range(n_base):
        lang = rng.choice(LANGS)
        n_lines = rng.choice([4, 8, 16, 32, 64, 128, 256])
        emit(_gen_file(rng, lang, n_lines), lang, cluster_id)
        cluster_id += 1

    # Edge cases among singletons: empty + tiny files.
    if rows:
        rows[0]["content"] = ""
        if len(rows) > 1:
            rows[1]["content"] = "x = 1\n"

    # Power-law duplicate clusters; first one giant (>= 5% of corpus).
    remaining = n_dup
    giant = max(2, n_files // 20)
    sizes = [min(giant, remaining)] if remaining else []
    remaining -= sizes[0] if sizes else 0
    while remaining > 0:
        s = min(remaining, max(2, int(rng.paretovariate(1.2))))
        sizes.append(s)
        remaining -= s

    for s in sizes:
        lang = rng.choice(LANGS)
        base = _gen_file(rng, lang, rng.choice([16, 32, 64, 128]))
        emit(base, lang, cluster_id)
        for _ in range(s - 1):
            kind = rng.choice(_TRANSFORMS)
            emit(_mutate(rng, base, kind), lang, cluster_id,
                 vendored=(kind == "vendored"))
        cluster_id += 1

    return rows


def corpus_df(spark, n_files: int, seed: int = 42, partitions: int | None = None):
    """Corpus as a DataFrame with derived file_id + content_sha256
    (the per-row invariant column, BASELINE.json input_hint)."""
    from pyspark.sql import functions as F

    rows = generate_corpus(n_files, seed)
    for i, r in enumerate(rows):
        r["file_id"] = i
    df = spark.createDataFrame(rows)
    if partitions:
        df = df.repartition(partitions)
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256)).select(
        "file_id", "repo", "path", "commit", "lang", "content",
        "content_sha256", "cluster_gt",
    )
