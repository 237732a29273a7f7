"""Regenerate the staleness ledger in COVERAGE.md.

Scans every CORRECTNESS_r*.json the driver has recorded and emits, per
registered query, the LAST round with a fully-green row (rows+schema+
hash all matching; rows-only queries count when rows matched) — the
machine-checkable record the rotation policy needs to keep any green
row from aging past ~3 rounds. Queries the driver has never seen show
round 0.

Check semantics (r13 verdict task 2): the driver writes
CORRECTNESS_r{N+1}.json AFTER the builder's final round-N commit, so
for four rounds the guard was mechanically red between rounds with
zero builder action possible. ``--check`` therefore compares the
ledger only against artifacts up to the round the ledger itself
records as newest; a NEWER artifact (driver wrote after round close)
prints a WARNING and exits 0 — the builder's round-start regeneration
picks it up. Staleness against an artifact the ledger claims to cover
still fails hard.

Usage:  python tools/coverage_rounds.py        # rewrites the ledger
        python tools/coverage_rounds.py --check # exit 1 if stale
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COVERAGE = os.path.join(REPO, "COVERAGE.md")
BEGIN = "<!-- BEGIN LAST-GREEN LEDGER (tools/coverage_rounds.py) -->"
END = "<!-- END LAST-GREEN LEDGER -->"


def artifact_rounds(repo: str = REPO) -> dict[int, str]:
    """Map round number -> CORRECTNESS artifact path."""
    out: dict[int, str] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            out[int(m.group(1))] = path
    return out


def _registered_names(repo: str = REPO) -> list[str]:
    sys.path.insert(0, repo)
    from daft_spark.queries import all_queries

    return list(all_queries())


def last_green_rounds(
    repo: str = REPO,
    names: list[str] | None = None,
    max_round: int | None = None,
) -> dict[str, int]:
    if names is None:
        names = _registered_names(repo)
    out = {name: 0 for name in names}
    for rnd, path in artifact_rounds(repo).items():
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if name not in out:
                continue  # renamed/retired query
            green = bool(rec.get("rows_match")) and (
                rec.get("hash_match") is None  # rows-only check
                or (bool(rec.get("schema_match")) and bool(rec.get("hash_match")))
            )
            if green and rnd > out[name]:
                out[name] = rnd
    return out


def render(rounds: dict[str, int], latest: int) -> str:
    by_round: dict[int, list[str]] = {}
    for name, rnd in rounds.items():
        by_round.setdefault(rnd, []).append(name)
    lines = [
        BEGIN,
        "",
        "## Last-green ledger (per query, driver rounds)",
        "",
        f"{len(rounds)} registered queries; generated from "
        "CORRECTNESS_r*.json by `python tools/coverage_rounds.py`. "
        "Round 0 = never driver-seen (post-freeze registration; "
        "rows-only queries DO earn rounds when their rows matched). "
        "Rotation policy: no green row should age past ~3 rounds "
        f"behind the newest artifact (currently r{latest}).",
        "",
        "| last green | n | queries |",
        "|---|---|---|",
    ]
    for rnd in sorted(by_round, reverse=True):
        names = sorted(by_round[rnd])
        lines.append(f"| r{rnd} | {len(names)} | {' '.join(names)} |")
    lines += ["", END]
    return "\n".join(lines)


def _recorded_latest(text: str) -> int | None:
    """Round the committed ledger claims as newest artifact."""
    m = re.search(r"\(currently r(\d+)\)", text)
    return int(m.group(1)) if m else None


def _splice(text: str, block: str) -> str:
    if BEGIN in text:
        return text[: text.index(BEGIN)] + block + text[text.index(END) + len(END):]
    return text.rstrip() + "\n\n" + block + "\n"


def check(repo: str = REPO, names: list[str] | None = None,
          coverage_path: str | None = None) -> int:
    """Return 0 if the ledger is current for the rounds it covers.

    Artifacts newer than the ledger's recorded round (the driver wrote
    after round close) WARN instead of failing.
    """
    cov = coverage_path or os.path.join(repo, "COVERAGE.md")
    with open(cov) as f:
        text = f.read()
    recorded = _recorded_latest(text)
    rounds_on_disk = artifact_rounds(repo)
    newest = max(rounds_on_disk, default=0)
    if recorded is None:
        print("COVERAGE.md has no ledger block — run tools/coverage_rounds.py")
        return 1
    cutoff = min(recorded, newest)
    expected = _splice(
        text, render(last_green_rounds(repo, names, max_round=cutoff), recorded)
    )
    if expected != text:
        print("COVERAGE.md ledger is stale for rounds it claims to cover "
              f"(<= r{cutoff}) — run tools/coverage_rounds.py")
        return 1
    if newest > recorded:
        print(f"WARNING: CORRECTNESS_r{newest:02d}.json is newer than the "
              f"ledger (r{recorded}) — driver wrote after round close; "
              "regenerate at round start (not a failure)")
    else:
        print("ledger up to date")
    return 0


def main() -> None:
    if "--check" in sys.argv:
        raise SystemExit(check())
    rounds = last_green_rounds()
    latest = max(artifact_rounds(), default=0)
    block = render(rounds, latest)
    with open(COVERAGE) as f:
        text = f.read()
    with open(COVERAGE, "w") as f:
        f.write(_splice(text, block))
    print(f"ledger rewritten ({len(rounds)} queries)")


if __name__ == "__main__":
    main()
