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
