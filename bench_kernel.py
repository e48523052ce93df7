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


def main() -> None:
    out = {}
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
