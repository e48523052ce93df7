"""Deterministic synthesis of the transcripts corpus + entity-resolution ground truth.

Implements FIXTURES.md §1/§3: a transcripts table with the exact BASELINE.json
input_hint shape (conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp), with 0-3 embedded email mentions per turn, ~10%
lax-only forms and ~5% invalid near-misses; plus the identities / labeled_pairs
tables the pairwise-F1 acceptance metric is computed against.

Everything is seeded (default 42) and wall-clock-free: ts is
2026-01-01T00:00:00Z + 60s * global_turn_number.

Variant minting mirrors the reference's equivalence semantics:
  * parity fields are case-SENSITIVE verbatim captures (email_address.rs:78),
    so case/dot/quote/CFWS variants are DISTINCT mention strings that the
    matcher must re-unite;
  * typo entities (1 edit away, same domain) are distinct identities — the
    negatives that force the scorer to be better than "same domain".
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import List, Tuple

import numpy as np
import pandas as pd

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_FIRST = [
    "ada", "grace", "alan", "edsger", "barbara", "donald", "tony", "leslie",
    "john", "maria", "nikla", "rosa", "imre", "sofia", "timo", "yuki",
]
_LAST = [
    "lovelace", "hopper", "turing", "dijkstra", "liskov", "knuth", "hoare",
    "lamport", "backus", "mayer", "wirth", "peter", "lakatos", "kova",
    "saari", "tanaka",
]
# weighted domain pool: the first entries are "hot" (gmail-like skew)
_DOMAINS = [
    "gmail.com", "yahoo.com", "outlook.com", "acme-corp.com", "example.org",
    "iana.org", "bücher.de", "españa.com", "mail.co.uk", "proton.me",
    "uni-institut.de", "研究所.jp",
]
_DOMAIN_WEIGHTS = np.array([0.30, 0.15, 0.12, 0.10, 0.08, 0.07, 0.05, 0.04, 0.03, 0.03, 0.02, 0.01])

_TEMPLATES = [
    "please forward the report to {m} before the deadline",
    "cc {m} on this thread",
    "the customer at {m} filed a ticket yesterday",
    "I looped in {m} and {m2} for visibility",
    "escalate to {m} if the job fails again",
    "signup recorded for {m} via the webhook",
    "no email mentioned in this turn at all",
    "metrics look flat, nothing actionable here",
    "reach me at {m} (work) going forward",
    "the alias {m} bounced, try {m2} instead",
]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["send_email", "crm_lookup", None]


@dataclass
class SynthResult:
    transcripts: pd.DataFrame
    identities: pd.DataFrame
    mentions_truth: pd.DataFrame  # one row per embedded mention occurrence
    labeled_pairs: pd.DataFrame


def _flip_case(s: str, rng: np.random.RandomState) -> str:
    chars = [c.upper() if rng.rand() < 0.5 and c.isalpha() else c for c in s]
    flipped = "".join(chars)
    return flipped if flipped != s else s.upper()


def _typo_domain(domain: str, rng: np.random.RandomState) -> str:
    """One-deletion typo inside the FIRST label of the domain (never the dot
    or the TLD, so the result still parses as a multi-label domain). The typo
    variant keeps its entity's identity — the cross-domain true-match
    material channels 3/4 of blocking.candidate_pairs exist for."""
    label, rest = domain.split(".", 1)
    if len(label) < 3:
        return f"{label}x.{rest}"  # too short to delete: append instead
    i = 1 + int(rng.randint(0, len(label) - 1))
    return f"{label[:i]}{label[i + 1:]}.{rest}"


def _typo(local: str, rng: np.random.RandomState) -> str:
    i = int(rng.randint(0, max(1, len(local) - 1)))
    if local[i] == "." or local[i] == "-":
        i = 0
    repl = chr(ord("a") + int(rng.randint(0, 26)))
    if repl == local[i]:
        repl = "z" if local[i] != "z" else "q"
    return local[:i] + repl + local[i + 1 :]


def mint_identities(n_entities: int, seed: int = 42) -> pd.DataFrame:
    """identities(entity_id, canonical_email, variants array<string>, lax_variants array<string>).

    Variants all strict- or lax-valid and (except the domain-typo variant)
    resolve to the same match key (dotless local, lowercased domain). ~30% of
    entities additionally get a DOMAIN-TYPO variant — same identity, domain
    one edit away — which no same-domain blocking can reach; ~25% get a
    sibling 'typo' entity one LOCAL edit away on the same domain (minted as
    separate identities, the hard negatives).
    """
    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    for k in range(n_entities):
        first = _FIRST[int(rng.randint(len(_FIRST)))]
        last = _LAST[int(rng.randint(len(_LAST)))]
        local = f"{first}.{last}{k}"
        domain = _DOMAINS[int(rng.choice(len(_DOMAINS), p=_DOMAIN_WEIGHTS))]
        canonical = f"{local}@{domain}"
        variants = [
            canonical,
            f"{local}@{_flip_case(domain, rng)}",          # domain case flip
            f"{local.replace('.', '')}@{domain}",           # dotless local
            f'"{local}"@{domain}',                           # quoted local
        ]
        if rng.rand() < 0.3:  # domain-typo variant(s), same identity
            tdom = _typo_domain(domain, rng)
            variants.append(f"{local}@{tdom}")
            if rng.rand() < 0.5:  # dot-variant local × domain typo
                variants.append(f"{local.replace('.', '')}@{tdom}")
        lax_variants = [
            f"\r\n {local}@{domain}",                        # leading FWS fold
            f"(note){local}@{domain}",                       # CFWS comment
            f"{local.replace('.', ' . ')}@{domain}",         # obs dotted words
        ]
        rows.append(
            {
                "entity_id": f"ent{eid:06d}",
                "canonical_email": canonical,
                "variants": variants,
                "lax_variants": lax_variants,
            }
        )
        eid += 1
        if rng.rand() < 0.25:  # sibling typo identity (negative pair material)
            tlocal = _typo(local, rng)
            tcanon = f"{tlocal}@{domain}"
            rows.append(
                {
                    "entity_id": f"ent{eid:06d}",
                    "canonical_email": tcanon,
                    "variants": [tcanon, f"{tlocal.replace('.', '')}@{domain}"],
                    "lax_variants": [f"(alt){tlocal}@{domain}"],
                }
            )
            eid += 1
    return pd.DataFrame(rows)


# Near-misses must be invalid under BOTH modes (note: FIXTURES.md's example
# 'foo-@bar.com' is strict-invalid but lax-VALID — obs atext includes '-'
# (nom_parser.rs:625-633) — so it cannot serve as ground-truth-invalid).
_INVALID_NEAR_MISSES = [
    "test@-iana.org",      # leading dash in domain label
    "te..st@x.com",        # empty dot-atom label
    "user@google-.com",    # trailing dash in domain label
    ".lead@dot.com",       # leading dot in local
    "trail.@x.com",        # trailing dot in local
]


def synthesize(
    n_convs: int = 100,
    turns_per_conv: int = 10,
    n_entities: int = 40,
    seed: int = 42,
) -> SynthResult:
    rng = np.random.RandomState(seed)
    identities = mint_identities(n_entities, seed=seed + 1)

    # flatten the variant pool with entity labels; lax variants tracked separately
    pool: List[Tuple[str, str, bool]] = []  # (mention, entity_id, lax_only)
    for row in identities.itertuples():
        for v in row.variants:
            pool.append((v, row.entity_id, False))
        for v in row.lax_variants:
            pool.append((v, row.entity_id, True))
    strict_pool = [p for p in pool if not p[2]]
    lax_pool = [p for p in pool if p[2]]

    t_rows = []
    m_rows = []
    global_turn = 0
    for ci in range(n_convs):
        conv_id = f"conv{ci:06d}"
        for ti in range(turns_per_conv):
            template = _TEMPLATES[int(rng.randint(len(_TEMPLATES)))]
            n_slots = template.count("{m}") + template.count("{m2}")
            text = template
            mention_idx = 0
            for slot in ("{m}", "{m2}"):
                while slot in text:
                    u = rng.rand()
                    if u < 0.05:
                        mention, entity, lax_only, valid = (
                            _INVALID_NEAR_MISSES[int(rng.randint(len(_INVALID_NEAR_MISSES)))],
                            None,
                            False,
                            False,
                        )
                    elif u < 0.15 and lax_pool:
                        mention, entity, lax_only = lax_pool[int(rng.randint(len(lax_pool)))]
                        valid = True
                    else:
                        mention, entity, lax_only = strict_pool[int(rng.randint(len(strict_pool)))]
                        valid = True
                    # complex forms (spaces/folds/comments/quotes) must be delimited
                    needs_brackets = any(c in mention for c in ' \t\r\n()"')
                    rendered = f"<{mention}>" if needs_brackets else mention
                    text = text.replace(slot, rendered, 1)
                    m_rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": ti,
                            "mention_idx": mention_idx,
                            "raw": mention,
                            "entity_id": entity,
                            "lax_only": lax_only,
                            "valid": valid,
                        }
                    )
                    mention_idx += 1
            t_rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": _ROLES[ti % 3],
                    "text": text,
                    "tool": _TOOLS[int(rng.randint(3))],
                    "ts": EPOCH + timedelta(seconds=60 * global_turn),
                }
            )
            global_turn += 1

    transcripts = pd.DataFrame(t_rows)
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    mentions_truth = pd.DataFrame(m_rows)
    labeled_pairs = build_labeled_pairs(mentions_truth)
    return SynthResult(transcripts, identities, mentions_truth, labeled_pairs)


def _match_key_domain(email: str) -> str:
    """Blocking domain for ground-truth pairing: lowercased verbatim domain tail."""
    return email.rsplit("@", 1)[1].strip().lower()


def build_labeled_pairs(mentions_truth: pd.DataFrame) -> pd.DataFrame:
    """labeled_pairs(email_a, email_b, block_key, is_match) — all intra-block
    pairs of distinct valid mention strings, label = same entity_id
    (FIXTURES.md §3; block key = exact lowercased domain, the same blocking
    key the pipeline uses), PLUS every same-entity CROSS-block pair (the
    domain-typo variants), so the F1 acceptance counts a missed cross-domain
    match as a false negative instead of silently excluding it."""
    uniq = (
        mentions_truth[mentions_truth["valid"]]
        .drop_duplicates(subset=["raw"])[["raw", "entity_id"]]
        .reset_index(drop=True)
    )
    uniq["block_key"] = uniq["raw"].map(_match_key_domain)
    pairs = []
    for key, grp in uniq.groupby("block_key"):
        recs = grp.sort_values("raw").to_dict("records")
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                pairs.append(
                    {
                        "email_a": recs[i]["raw"],
                        "email_b": recs[j]["raw"],
                        "block_key": key,
                        "is_match": recs[i]["entity_id"] == recs[j]["entity_id"],
                    }
                )
    for ent, grp in uniq[uniq["entity_id"].notna()].groupby("entity_id"):
        recs = grp.sort_values("raw").to_dict("records")
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                if recs[i]["block_key"] != recs[j]["block_key"]:
                    pairs.append(
                        {
                            "email_a": recs[i]["raw"],
                            "email_b": recs[j]["raw"],
                            "block_key": f'{recs[i]["block_key"]}|{recs[j]["block_key"]}',
                            "is_match": True,
                        }
                    )
    return pd.DataFrame(pairs, columns=["email_a", "email_b", "block_key", "is_match"])
