"""Regenerate the staleness ledger in COVERAGE.md.

Scans every CORRECTNESS_r*.json the driver has recorded and emits, per
registered query, the LAST round with a fully-green row (rows+schema+
hash all matching; rows-only queries count when rows matched) — the
machine-checkable record the rotation policy needs to keep any green
row from aging past ~3 rounds. Queries the driver has never seen show
round 0.

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


def last_green_rounds() -> dict[str, int]:
    sys.path.insert(0, REPO)
    from daft_spark.queries import all_queries

    out = {name: 0 for name in all_queries()}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
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


def _latest_artifact_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def render(rounds: dict[str, int]) -> str:
    latest = _latest_artifact_round()
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


def main() -> None:
    rounds = last_green_rounds()
    block = render(rounds)
    with open(COVERAGE) as f:
        text = f.read()
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        new = pre + block + post
    else:
        new = text.rstrip() + "\n\n" + block + "\n"
    if "--check" in sys.argv:
        if new != text:
            print("COVERAGE.md ledger is stale — run tools/coverage_rounds.py")
            raise SystemExit(1)
        print("ledger up to date")
        return
    with open(COVERAGE, "w") as f:
        f.write(new)
    print(f"ledger rewritten ({len(rounds)} queries)")


if __name__ == "__main__":
    main()
