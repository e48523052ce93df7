#!/usr/bin/env python
"""Kernel microbenchmark on the reference's six bench inputs.

The reference publishes per-call latencies for parse/is_valid/new over six
fixed inputs (BASELINE.md, /root/reference/Performance.md:14-51,
rust-lib/benches/benchmarks.rs:5-11). This harness times the SAME inputs
through our kernel two ways:

  * scalar     — one Python call per input (apples-to-apples with Criterion)
  * vectorized — pandas batch through parse_batch / Series.str.fullmatch,
    the form the Spark engine actually executes per Arrow batch

Prints one JSON line: ns/op per (api, case, mode) + aggregate throughput.
"""

from __future__ import annotations

import json
import time

import pandas as pd

from email_address_parser_spark.functions.udfs import parse_batch
from email_address_parser_spark.kernel.parser import is_valid_email, parse_email

CASES = {
    "valid": "foo@bar.com",
    "invalid_local_part": "foo-@bar.com",
    "invalid_domain": "foo@-bar.com",
    "unicode": "foö@bär.com",
    "long": "this.is.a.very-long.email@super-super.deliberately.long.and.awesome-domain.com",
    "obs_lax": '"\r\n test"@iana.org',
}

SCALAR_ITERS = 20_000
BATCH = 100_000


def bench_scalar(fn) -> float:
    t0 = time.perf_counter()
    for _ in range(SCALAR_ITERS):
        fn()
    return (time.perf_counter() - t0) / SCALAR_ITERS * 1e9


def _simhash_per_token_reference(texts) -> "list":
    """The round-2 per-token-occurrence loop, kept here ONLY as the
    microbench baseline for the vectorized simhash_batch kernel."""
    import hashlib

    import numpy as np

    from email_address_parser_spark.operators.dedup import _BIT_WEIGHTS, _TOKEN_RE

    memo: dict = {}
    out = []
    for s in texts:
        tokens = _TOKEN_RE.findall(s.lower()) if isinstance(s, str) else []
        if not tokens:
            out.append(0)
            continue
        rows = np.empty((len(tokens), 64), dtype=np.int8)
        for i, t in enumerate(tokens):
            row = memo.get(t)
            if row is None:
                h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                row = (2 * bits.astype(np.int8)) - 1
                memo[t] = row
            rows[i] = row
        votes = rows.astype(np.int64).sum(axis=0)
        out.append(int(((votes > 0) * _BIT_WEIGHTS).sum()))
    return out


def bench_simhash(n_docs: int = 10_000) -> dict:
    """10k-doc batch, zipfian 5000-token vocabulary (real text is zipfian),
    100-500 tokens/doc (web-document scale): vectorized simhash_batch vs the
    round-2 per-token loop. Identical signatures asserted. Reports both
    end-to-end and post-tokenize kernel time (tokenization — the one
    irreducible Python regex pass — is common to both paths)."""
    import numpy as np

    from email_address_parser_spark.operators.dedup import _TOKEN_RE, simhash_batch

    rng = np.random.RandomState(7)
    zipf_w = 1.0 / np.arange(1, 5001) ** 1.1
    zipf_w /= zipf_w.sum()
    vocab = np.array([f"tok{i}" for i in range(5000)], dtype=object)
    docs = [
        " ".join(rng.choice(vocab, size=rng.randint(100, 500), p=zipf_w))
        for _ in range(n_docs)
    ]
    t0 = time.perf_counter()
    for s in docs:
        _TOKEN_RE.findall(s.lower())
    t_tok = time.perf_counter() - t0
    t0 = time.perf_counter()
    fast = simhash_batch(docs)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    slow = _simhash_per_token_reference(docs)
    t_slow = time.perf_counter() - t0
    assert list(fast) == slow, "vectorized simhash diverged from reference loop"
    return {
        "simhash_tokenize_only_10k_sec": round(t_tok, 3),
        "simhash_batch_10k_sec": round(t_fast, 3),
        "simhash_loop_10k_sec": round(t_slow, 3),
        "simhash_speedup_end_to_end": round(t_slow / t_fast, 1),
        "simhash_speedup_post_tokenize": round(
            (t_slow - t_tok) / max(t_fast - t_tok, 1e-9), 1
        ),
    }


def main() -> None:
    out = {}
    out.update(bench_simhash())
    for case, s in CASES.items():
        lax = case == "obs_lax"
        out[f"parse/{case}/scalar_ns"] = round(
            bench_scalar(lambda: parse_email(s, lax)), 1
        )
        out[f"is_valid/{case}/scalar_ns"] = round(
            bench_scalar(lambda: is_valid_email(s, lax)), 1
        )
        series = pd.Series([s] * BATCH)
        t0 = time.perf_counter()
        parse_batch(series)
        out[f"parse/{case}/vectorized_ns"] = round(
            (time.perf_counter() - t0) / BATCH * 1e9, 1
        )
    valid_ns = out["parse/valid/vectorized_ns"]
    print(
        json.dumps(
            {
                "metric": "kernel parse ns/op (reference bench inputs)",
                "results": out,
                "vectorized_valid_per_core_per_sec": round(1e9 / valid_ns),
                "note": "reference: Rust 79.14ns, WASM 257.42ns, JS-regex 144.06ns "
                "per strict-valid parse (Performance.md:24)",
            }
        )
    )


if __name__ == "__main__":
    main()
