"""Deterministic synthetic transcript corpus + query set (FIXTURES.md F1/F2).

Schema is exactly the BASELINE `input_hint`:
  (conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
   ts:timestamp[us])

Generation is seeded (numpy PCG64, seed=42 by default), wall-clock-free, and
partitioned by conversation ranges: file k holds convs
[k*per_file, (k+1)*per_file), so files are disjoint, lexicographically ordered
conv_id ranges — the partitioning invariant the index build's docID
assignment relies on (SURVEY.md §7.0).  Content is deterministic for a fixed
(seed, n_conv, n_files) triple.

Text is a Zipfian token stream (s=1.1, 20k-term vocab ``w00000``..) with
injected HOT terms (role boilerplate: "assistant", "user", tool names, "ok",
"error") to create the skew the salted posting shuffle must handle, ~3%
uppercase/punctuated tokens and rare >255-char runs to exercise the analyzer,
and stopword injection in ~8% of turns.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 20_000
ZIPF_S = 1.1
TOOLS = ["search", "browser", "bash", "python", "editor", "none"]
HOT_TERMS = ["ok", "error", "assistant", "user"] + TOOLS
STOP_SAMPLE = ["the", "of", "to", "and", "in", "is", "that", "it"]
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_VOCAB = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)], dtype=object)
_p = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S
_ZIPF_P = _p / _p.sum()


def gen_conv_range(conv_start: int, n_conv: int, seed: int = SEED) -> pa.Table:
    """Generate turns for conversations [conv_start, conv_start+n_conv)."""
    rng = np.random.default_rng([seed, conv_start])

    n_turns_per_conv = np.minimum(1 + rng.poisson(7, size=n_conv), 40).astype(np.int64)
    total_turns = int(n_turns_per_conv.sum())
    conv_of_turn = np.repeat(np.arange(n_conv, dtype=np.int64), n_turns_per_conv)
    starts = np.zeros(n_conv, dtype=np.int64)
    np.cumsum(n_turns_per_conv[:-1], out=starts[1:])
    turn_idx = np.arange(total_turns, dtype=np.int64) - starts[conv_of_turn]

    # roles: cycle user/assistant; ~10% of assistant turns followed by a tool turn
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_turn = (rng.random(total_turns) < 0.10) & (turn_idx % 2 == 1)
    role[tool_turn] = "tool"
    tool_col = np.full(total_turns, None, dtype=object)
    tool_names = rng.choice(np.array(TOOLS, dtype=object), size=int(tool_turn.sum()))
    tool_col[tool_turn] = tool_names

    # tokens per turn: log-normal in [5, 120]
    ntok = np.clip(np.exp(rng.normal(3.0, 0.7, size=total_turns)).astype(np.int64), 5, 120)
    total_tok = int(ntok.sum())
    tok_ids = rng.choice(VOCAB_SIZE, size=total_tok, p=_ZIPF_P)
    tokens = _VOCAB[tok_ids].copy()

    # hot-term injection: ~2.5% of tokens replaced by hot terms
    hot_mask = rng.random(total_tok) < 0.025
    tokens[hot_mask] = rng.choice(np.array(HOT_TERMS, dtype=object), size=int(hot_mask.sum()))
    # stopword injection: ~8% of turns get stopwords sprinkled on ~10% of their tokens
    turn_of_tok = np.repeat(np.arange(total_turns, dtype=np.int64), ntok)
    stop_turns = rng.random(total_turns) < 0.08
    stop_tok_mask = stop_turns[turn_of_tok] & (rng.random(total_tok) < 0.10)
    tokens[stop_tok_mask] = rng.choice(np.array(STOP_SAMPLE, dtype=object), size=int(stop_tok_mask.sum()))
    # surface noise: ~2% uppercase, ~1% trailing punctuation, ~0.05% >255-char runs
    up_mask = rng.random(total_tok) < 0.02
    tokens[up_mask] = [t.upper() for t in tokens[up_mask]]
    punct_mask = rng.random(total_tok) < 0.01
    tokens[punct_mask] = [t + "," for t in tokens[punct_mask]]
    long_mask = rng.random(total_tok) < 0.0005
    tokens[long_mask] = ["x" * 300 for _ in range(int(long_mask.sum()))]

    # per-role boilerplate prefix (guarantees hot bigrams for phrase queries)
    prefix = np.where(
        role == "user", "user question", np.where(role == "assistant", "assistant answer", "tool output")
    ).astype(object)
    tool_pref = tool_col.copy()
    prefix[tool_turn] = [f"tool output {t}" for t in tool_pref[tool_turn]]

    tok_starts = np.zeros(total_turns, dtype=np.int64)
    np.cumsum(ntok[:-1], out=tok_starts[1:])
    tok_list = tokens.tolist()
    texts = [
        prefix[i] + " " + " ".join(tok_list[tok_starts[i] : tok_starts[i] + ntok[i]])
        for i in range(total_turns)
    ]

    conv_ids = np.array([f"conv-{conv_start + i:08d}" for i in range(n_conv)], dtype=object)
    ts = BASE_TS_US + (conv_of_turn + conv_start) * 3_600_000_000 + turn_idx * 30_000_000

    return pa.table(
        {
            "conv_id": pa.array(conv_ids[conv_of_turn], type=pa.string()),
            "turn_idx": pa.array(turn_idx.astype(np.int32)),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool_col, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def write_transcripts(
    out_dir: str | Path, n_conv: int, n_files: int, seed: int = SEED, force: bool = False
) -> list[str]:
    """Write the corpus as n_files conv-range-partitioned parquet files.

    Idempotent: skips generation when a matching _MANIFEST.json exists.
    Returns the sorted list of data-file paths.
    """
    out_dir = Path(out_dir)
    meta = {"n_conv": n_conv, "n_files": n_files, "seed": seed, "version": 1}
    manifest = out_dir / "_MANIFEST.json"
    if manifest.exists() and not force:
        try:
            if json.loads(manifest.read_text()) == meta:
                return sorted(str(p) for p in out_dir.glob("part-*.parquet"))
        except (json.JSONDecodeError, OSError):
            pass
    out_dir.mkdir(parents=True, exist_ok=True)
    for old in out_dir.glob("part-*.parquet"):
        old.unlink()
    per_file = (n_conv + n_files - 1) // n_files
    paths = []
    for k in range(n_files):
        lo = k * per_file
        cnt = min(per_file, n_conv - lo)
        if cnt <= 0:
            break
        t = gen_conv_range(lo, cnt, seed=seed)
        p = out_dir / f"part-{k:05d}.parquet"
        tmp = out_dir / f".part-{k:05d}.parquet.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, p)
        paths.append(str(p))
    manifest.write_text(json.dumps(meta))
    return sorted(paths)


def reference_queries() -> list[dict]:
    """The fixed reference query set (FIXTURES.md F2): 100 queries.

    Query syntax: terms (default OR/SHOULD), '+term' = MUST, '-term' =
    MUST_NOT, quoted = phrase.  k defaults to 10 with a few edge cases.
    """
    qs: list[dict] = []
    # 40 single-term: hot head terms + Zipf head/mid/tail
    singles = HOT_TERMS + [f"w{i:05d}" for i in
                           [0, 1, 2, 3, 5, 8, 13, 21, 50, 99, 200, 500, 999, 1500,
                            2500, 4000, 6000, 9000, 12000, 15000, 17500, 19000,
                            19500, 19900, 19990, 19999, 7, 42, 123, 777, 3141, 2718]]
    for t in singles[:40]:
        qs.append({"query": t, "k": 10})
    # 30 multi-term OR
    rng = np.random.default_rng(SEED + 1)
    for _ in range(30):
        n = int(rng.integers(2, 5))
        terms = [str(s) for s in rng.choice(np.array(singles, dtype=object), size=n, replace=False)]
        qs.append({"query": " ".join(terms), "k": 10})
    # 15 AND conjunctions
    for _ in range(15):
        n = int(rng.integers(2, 4))
        terms = [str(s) for s in rng.choice(np.array(singles[:20], dtype=object), size=n, replace=False)]
        qs.append({"query": " ".join("+" + t for t in terms), "k": 10})
    # 10 phrases guaranteed present via boilerplate
    phrases = ['"assistant answer"', '"user question"', '"tool output"',
               '"tool output bash"', '"tool output search"', '"tool output python"',
               '"assistant answer ok"', '"user question error"',
               '"tool output browser"', '"tool output editor"']
    for p in phrases:
        qs.append({"query": p, "k": 10})
    # 5 edge cases
    qs.append({"query": "the of and", "k": 10})          # stopwords only → empty
    qs.append({"query": "zzzznotfound", "k": 10})         # unknown term → empty
    qs.append({"query": "assistant", "k": 1})
    qs.append({"query": "error ok", "k": 100})
    qs.append({"query": "+assistant -error", "k": 10})
    for i, q in enumerate(qs):
        q["qid"] = i
    return qs
