"""Property-based tests (hypothesis) for the parse kernel and extraction.

The reference has no randomized tests (SURVEY.md §5.5); these strengthen the
kernel beyond the fixed corpus: grammar invariants that must hold for ALL
inputs, not just the ~3k corpus cases."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from email_address_parser_spark.kernel.parser import (
    EmailAddress,
    ParsingOptions,
    is_valid_email,
    parse_email,
)

# atext chars minus '-' (label rule: no leading/trailing dash per dot-label)
_ATEXT_NO_DASH = string.ascii_letters + string.digits + "!#$%&'*+/=?^_`{|}~"

label = st.text(alphabet=_ATEXT_NO_DASH, min_size=1, max_size=8)
dot_atom = st.lists(label, min_size=1, max_size=4).map(".".join)


@given(local=dot_atom, domain=dot_atom)
@settings(max_examples=200, deadline=None)
def test_constructed_dot_atoms_are_strict_valid(local, domain):
    addr = f"{local}@{domain}"
    parsed = parse_email(addr, is_lax=False)
    assert parsed == (local, domain)
    assert is_valid_email(addr)


@given(value=st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_strict_implies_lax_and_split_is_verbatim(value):
    strict = parse_email(value, is_lax=False)
    lax = parse_email(value, is_lax=True)
    if strict is not None:
        # strict grammar always attempted first -> identical captures in lax
        assert lax == strict
    if lax is not None:
        local, domain = lax
        # verbatim-capture invariant: concatenation reproduces the input
        assert f"{local}@{domain}" == value


@given(value=st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_is_valid_agrees_with_parse(value):
    for is_lax in (False, True):
        assert is_valid_email(value, is_lax) == (
            parse_email(value, is_lax) is not None
        )


@given(local=dot_atom, domain=dot_atom)
@settings(max_examples=100, deadline=None)
def test_lax_constructor_is_total(local, domain):
    # email_address.rs:265-271 — lax `new` accepts ANY pair verbatim
    garbage_local = local + " not an atom ("
    addr = EmailAddress.new(garbage_local, domain, ParsingOptions(is_lax=True))
    assert addr.local_part == garbage_local
    assert addr.domain == domain


@given(
    prefix=st.text(alphabet=string.printable, max_size=20).filter(
        lambda s: "@" not in s and "<" not in s and ">" not in s
    ),
    local=dot_atom,
    domain=dot_atom,
)
@settings(max_examples=100, deadline=None)
def test_extraction_finds_embedded_address(prefix, local, domain):
    from email_address_parser_spark.functions.udfs import extract_candidates

    addr = f"{local}@{domain}"
    text = f"{prefix} {addr} suffix"
    candidates = extract_candidates(text)
    assert addr in candidates


# ---------------------------------------------------------------------------
# vectorized kernels == scalar definitions
# ---------------------------------------------------------------------------


@given(
    pairs=st.lists(
        st.tuples(st.text(max_size=40), st.text(max_size=40)), max_size=60
    )
)
@settings(max_examples=150, deadline=None)
def test_jw_batch_equals_scalar(pairs):
    """The numpy batch Jaro-Winkler is bit-identical to the scalar
    formulation (which pytest separately pins to DuckDB's
    jaro_winkler_similarity)."""
    import numpy as np
    import pandas as pd

    from email_address_parser_spark.operators.scoring import (
        jaro_winkler_batch,
        jaro_winkler_similarity,
    )

    a = pd.Series([p[0] for p in pairs], dtype=object)
    b = pd.Series([p[1] for p in pairs], dtype=object)
    got = jaro_winkler_batch(a, b)
    want = np.array([jaro_winkler_similarity(x, y) for x, y in pairs])
    assert got.shape == want.shape
    assert (got == want).all()


@given(strings=st.lists(st.text(max_size=80), max_size=40))
@settings(max_examples=150, deadline=None)
def test_minhash_batch_equals_scalar_definition(strings):
    """The reduceat batch minhash equals the per-string definition:
    min over 3-gram polynomial hashes of each affine-mod-2^31 permutation."""
    from email_address_parser_spark.operators.blocking import (
        M31,
        MINHASH_A,
        MINHASH_B,
        _gram_hash_str,
        minhash_signatures_batch,
    )

    sigs = minhash_signatures_batch(strings)
    for i, s in enumerate(strings):
        grams = [s] if len(s) < 3 else [s[j : j + 3] for j in range(len(s) - 2)]
        hs = [_gram_hash_str(g) for g in grams]
        want = [
            min((int(ak) * h + int(bk)) & M31 for h in hs)
            for ak, bk in zip(MINHASH_A, MINHASH_B)
        ]
        assert sigs[i].tolist() == want, (i, s)
