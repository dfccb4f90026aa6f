"""Runtime attestation-history loader (VERDICT r6 item 1).

``LAST_ATTESTED`` maps each registry query to the latest round in
which the grading driver attested it, computed AT IMPORT TIME from the
``CORRECTNESS_r*.json`` files committed at the repo root. Rounds 5-6
used a generated snapshot module instead; that snapshot went stale the
moment the driver wrote the current round's CORRECTNESS file *after*
the final commit, reddening HEAD with a staleness guard two rounds
running. Loading at runtime makes that race impossible: a newer
CORRECTNESS file simply feeds the next rotation, and the suite stays
green at any HEAD.

"Attested" means a three-green driver row (rows + schema + value-hash
all match) — or, for the by-design rows-only queries (no SQL oracle
exists), a successful rows-only run (``err == "no_oracle"`` or a
null-oracle row with real ``spark_rows``): that row IS that query's
maximal attainable attestation, so it participates in the rotation
like any other.

The registry (hbasewd_spark/queries.py ``_ordered_names``) sorts
oldest-attested-first over this table, so the driver's 50-slot window
is always exactly the stalest 50 hash-attestable queries — no
curation, no regeneration step, no end-of-round race.
"""

from __future__ import annotations

import glob
import json
import os
import re

__all__ = ["LAST_ATTESTED", "attested", "compute_last_attested", "latest_round"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def attested(row: dict, rows_only_ok: bool = False) -> bool:
    """One driver row counts as an attestation if it was three-green,
    or — ONLY for queries explicitly designated oracle-less
    (``rows_only_ok``) — a successful rows-only / tolerance-gated run.

    The designation is the caller's, from the registry's own
    oracle-less set — never inferred from the row shape (ADVICE r7: a
    hash-capable query whose oracle comparison was skipped for any
    other reason produces the same null-schema/hash shape, and counting
    it would rotate the query out of the driver window with its values
    never verified)."""
    if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
        return True
    if not rows_only_ok:
        return False
    # driver schema: err == "no_oracle"; check_oracles --json schema:
    # rows_match True with schema/hash None (err may carry a
    # tolerance-gate record). All mean "no exact oracle by design, ran
    # successfully" — maximal attainable attestation for these queries.
    if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
        return True
    return (
        row.get("rows_match") is True
        and row.get("schema_match") is None
        and row.get("hash_match") is None
        and row.get("spark_rows") is not None
    )


def compute_last_attested(
    repo_root: str, no_oracle: set[str] | None = None
) -> tuple[dict[str, int], list[str]]:
    """(query -> latest attested round, correctness files used).

    Scans ``CORRECTNESS_r*.json`` in ``repo_root``; malformed or
    unreadable files are skipped (a half-written driver file must not
    break imports mid-round). ``no_oracle``: the queries designated
    rows-only by the registry (no SQL oracle exists) — only those may
    attest via a rows-only row; with the default ``None`` no query
    may (strict)."""
    no_oracle = no_oracle or set()
    last: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))
    used: list[str] = []
    for path in files:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        used.append(os.path.basename(path))
        for name, row in rows.items():
            if isinstance(row, dict) and attested(row, name in no_oracle):
                last[name] = max(last.get(name, 0), rnd)
    return last, used


def latest_round(repo_root: str = _REPO_ROOT) -> int:
    """Highest round number among the committed CORRECTNESS files
    (0 if none exist)."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


LAST_ATTESTED, _FILES = compute_last_attested(_REPO_ROOT)
