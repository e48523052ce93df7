"""Scalar parse/validate API with the reference's exact semantics.

Mirrors the public surface of the reference crate (SURVEY.md §2A):
  - parse / parse_core:  /root/reference/rust-lib/src/email_address.rs:149-155,233-239
  - is_valid:            email_address.rs:177-179
  - new (constructor):   email_address.rs:257-274 (lax mode is total: accepts any
    pair verbatim on parse failure, email_address.rs:265-271)
  - Display round-trip:  email_address.rs:312-316

Key invariants (SURVEY.md §1.4):
  * captures are VERBATIM sub-slices of the input — whitespace, CRLF folds,
    comments, quotes and escapes are preserved; no trimming, no case folding.
  * the strict grammar is always attempted first, even in lax mode
    (nom_parser.rs:12-22).
  * the local/domain split is decided by the grammar (capture groups), not by
    lastIndexOf('@') — '@' may legally occur inside quoted strings, comments and
    domain literals.
"""

from __future__ import annotations

from typing import Optional, Tuple

from .grammar import (
    EMAIL_LAX_RE,
    EMAIL_STRICT_RE,
    deep_patterns,
    maybe_deep_comment,
    paren_depth_bound,
)


def parse_email(value: str, is_lax: bool = False) -> Optional[Tuple[str, str]]:
    """Anchored parse → (local_part, domain) verbatim slices, or None.

    Strict grammar first; the lax (obsolete-syntax) grammar only runs when the
    strict attempt fails and ``is_lax`` is set — same control flow as the
    reference's parse_address (nom_parser.rs:12-22). Candidates that might
    contain comments nested deeper than the default pattern's bound retry
    with the depth-128 grammar (Rust parity, nom_parser.rs:9,425-450)."""
    if value is None:
        return None
    m = EMAIL_STRICT_RE.fullmatch(value)
    deep = None
    if m is None and maybe_deep_comment(value):
        deep = deep_patterns(paren_depth_bound(value))
        m = deep[0].fullmatch(value)
    if m is None and is_lax:
        m = EMAIL_LAX_RE.fullmatch(value)
        if m is None and deep is not None:
            m = deep[1].fullmatch(value)
    if m is None:
        return None
    return m.group("local"), m.group("domain")


def is_valid_email(value: str, is_lax: bool = False) -> bool:
    """Boolean verdict without capture materialization (email_address.rs:177-179)."""
    if value is None:
        return False
    if EMAIL_STRICT_RE.fullmatch(value) is not None:
        return True
    if is_lax and EMAIL_LAX_RE.fullmatch(value) is not None:
        return True
    if maybe_deep_comment(value):
        deep = deep_patterns(paren_depth_bound(value))
        if deep[0].fullmatch(value) is not None:
            return True
        if is_lax and deep[1].fullmatch(value) is not None:
            return True
    return False


class ParsingOptions:
    """email_address.rs:17-33 — default strict."""

    __slots__ = ("is_lax",)

    def __init__(self, is_lax: bool = False) -> None:
        self.is_lax = bool(is_lax)


class InvalidEmailError(ValueError):
    """Raised by strict EmailAddress.new on invalid input (≙ Rust Err/JS throw)."""


class EmailAddress:
    """Owned (local_part, domain) pair; equality/hash are exact, case-sensitive
    pair equality — entity resolution must NOT assume case-insensitive equality
    for these parity fields (email_address.rs:78, tests :330-340)."""

    __slots__ = ("local_part", "domain")

    def __init__(self, local_part: str, domain: str) -> None:
        self.local_part = local_part
        self.domain = domain

    # -- constructors ------------------------------------------------------

    @classmethod
    def parse(cls, value: str, options: Optional[ParsingOptions] = None) -> Optional["EmailAddress"]:
        parsed = parse_email(value, options.is_lax if options else False)
        if parsed is None:
            return None
        return cls(parsed[0], parsed[1])

    @classmethod
    def new(cls, local_part: str, domain: str, options: Optional[ParsingOptions] = None) -> "EmailAddress":
        """Validate by parsing '{local}@{domain}'.

        Strict failure raises with the reference's message — which blames the
        local part unconditionally, even when the domain is at fault
        (email_address.rs:266). Lax mode never fails: the pair is stored
        verbatim, unvalidated (email_address.rs:268-271).
        """
        is_lax = options.is_lax if options else False
        parsed = parse_email(f"{local_part}@{domain}", is_lax)
        if parsed is not None:
            return cls(parsed[0], parsed[1])
        if is_lax:
            return cls(local_part, domain)
        raise InvalidEmailError(f"Invalid local part '{local_part}'.")

    @staticmethod
    def is_valid(value: str, options: Optional[ParsingOptions] = None) -> bool:
        return is_valid_email(value, options.is_lax if options else False)

    # -- accessors / protocol ---------------------------------------------

    def get_local_part(self) -> str:
        return self.local_part

    def get_domain(self) -> str:
        return self.domain

    def __str__(self) -> str:  # exact round-trip for parsed addresses
        return f"{self.local_part}@{self.domain}"

    def __repr__(self) -> str:
        return f"EmailAddress({self.local_part!r}, {self.domain!r})"

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, EmailAddress):
            return NotImplemented
        return self.local_part == other.local_part and self.domain == other.domain

    def __hash__(self) -> int:
        return hash((self.local_part, self.domain))
