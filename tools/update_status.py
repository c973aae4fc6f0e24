"""Regenerate the README status block from the NEWEST shipped
BENCH_r*.json — the record of note. Round 7's verdict found the README
quoting a builder's idle-host best run (4.53s) while the shipped record
said 5.057s; this tool makes that class of drift impossible: the status
block is generated, byte-for-byte, from the driver's own file.

Usage: python tools/update_status.py  (run from anywhere)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_S = 8.777  # round-1 headline, BASELINE.md

BEGIN = "<!-- STATUS:BEGIN"
END = "<!-- STATUS:END -->"


def newest_bench() -> tuple[int, dict]:
    files = glob.glob(os.path.join(HERE, "BENCH_r*.json"))
    if not files:
        raise SystemExit("no BENCH_r*.json found")
    # sort by the PARSED round number, not lexicographically — a bare
    # lexicographic files[-1] silently picks the wrong "newest" once
    # rounds outgrow the zero-padded width (r100 < r99) or a
    # non-padded name (BENCH_r9.json) appears beside two-digit ones
    path = max(
        files, key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1))
    )
    n = int(re.search(r"BENCH_r(\d+)\.json$", path).group(1))
    with open(path) as f:
        raw = json.load(f)
    # driver wrapper ({"parsed": {...}}) or the bare payload
    return n, raw.get("parsed", raw)


def _bench_clean_hi() -> float:
    """The single source of truth for the probe's clean ceiling is
    bench.PROBE_CLEAN_SPREAD — importing it (rather than carrying an
    independent copy here) keeps the refresh tool and this
    adjudication gate from silently drifting apart (r11 ADVICE)."""
    sys.path.insert(0, HERE)
    from bench import PROBE_CLEAN_SPREAD

    return PROBE_CLEAN_SPREAD[1]


def contended_walls(
    walls: dict, clean_hi: float | None = None, factor: float = 3.0
) -> list[str]:
    """Names whose stamped calibration probe (bench.py PROBE_QUERY, one
    rep of q_scan_parquet at sf0.1, clean idle-host max 0.192s per the
    r1-r10 record) exceeded ``factor`` x the clean max when the wall
    was measured — i.e. the HOST was demonstrably contended and the
    wall is an upper bound, not a claim. Entries with no probe stamp
    (pre-r11 measurements) are not flagged; they simply carry no
    adjudication either way."""
    if clean_hi is None:
        clean_hi = _bench_clean_hi()
    out = []
    for q, e in sorted(walls.items()):
        if not isinstance(e, dict):
            continue
        p = e.get("probe_sec")
        if p is not None and p > factor * clean_hi:
            out.append(q)
    return out


def registry_counts() -> tuple[int, int]:
    sys.path.insert(0, HERE)
    from breweries_data_pipeline_spark.queries import REGISTRY

    total = len(REGISTRY)
    oracled = sum(1 for _, (_, s) in REGISTRY.items() if s is not None)
    return total, oracled


def main() -> None:
    n, bench = newest_bench()
    total, oracled = registry_counts()
    value = bench["value"]
    isolated = bench.get("headline_isolated")
    ratio = value / BASELINE_S
    soak = bench.get("soak") or {}
    iso_txt = f" / {isolated:.3f}s isolated" if isolated is not None else ""
    # r12: the bench emits headline_best_clean — the best headline among
    # legs whose own calibration probe certified an uncontended
    # measurement — so the status line can carry a probe-adjudicated
    # number instead of a possibly-contended median alone
    best_clean = bench.get("headline_best_clean")
    if "headline_legs" in bench:
        clean_txt = (
            f"; best probe-clean leg **{best_clean:.3f}s**"
            if best_clean is not None
            else "; no leg probe-clean (record self-tagged contended)"
        )
    else:
        clean_txt = ""
    soak_txt = ""
    if soak:
        soak_txt = (
            f"; sf1 soak covered {soak.get('covered', '?')} suite queries"
            f"{' in a fresh JVM' if soak.get('fresh_jvm') else ''}"
        )
        rot = soak.get("rotation") or {}
        if rot.get("covered"):
            soak_txt += (
                f" plus a {rot['covered']}-query coverage-leg rotation "
                f"(cohort {rot.get('cohort')})"
            )
    block = (
        f"{BEGIN} (regenerate with tools/update_status.py — quotes the\n"
        f"     newest shipped BENCH_r*.json verbatim; idle-host best runs belong in\n"
        f"     SCALE.md history, clearly labeled, never here) -->\n"
        f"**Status** (round {n} record, quoted from the shipped "
        f"`BENCH_r{n:02d}.json`):\n"
        f"{total} registry queries ({oracled} with full DuckDB value-hash "
        f"oracles);\n"
        f"headline bench **{value:.3f}s median{iso_txt}** at sf0.1 "
        f"(**{ratio:.2f}×** the round-1 baseline {BASELINE_S}s)"
        f"{clean_txt}{soak_txt}.\n"
        f"{END}"
    )
    readme = os.path.join(HERE, "README.md")
    with open(readme) as f:
        text = f.read()
    i, j = text.index(BEGIN), text.index(END) + len(END)
    with open(readme, "w") as f:
        f.write(text[:i] + block + text[j:])
    print(f"README status block regenerated from BENCH_r{n:02d}.json "
          f"({value:.3f}s / {ratio:.2f}x)")
    # round-open hygiene companion: the driver's round-end bench
    # refreshes the committed SF1_WALLS.json AFTER the round's last
    # commit — surface it so the new walls get committed alongside
    # this regeneration instead of sitting dirty all round
    import subprocess

    r = subprocess.run(
        ["git", "-C", HERE, "status", "--porcelain", "SF1_WALLS.json"],
        capture_output=True, text=True,
    )
    if r.stdout.strip():
        print("SF1_WALLS.json has uncommitted driver-run updates — "
              "commit them with the status regeneration")
    # flag probe-adjudicated contended walls (r11: every measurement
    # carries {load, probe_sec}; see bench.py PROBE_QUERY block)
    walls_path = os.path.join(HERE, "SF1_WALLS.json")
    try:
        with open(walls_path) as f:
            walls = json.load(f)
    except (FileNotFoundError, ValueError):
        walls = {}
    flagged = contended_walls(walls)
    if flagged:
        print(f"{len(flagged)} SF1_WALLS entries measured under a "
              f"contended host (probe > 3x clean max) — treat as upper "
              f"bounds / refresh on a quiet window: "
              + ", ".join(flagged[:12])
              + ("..." if len(flagged) > 12 else ""))


if __name__ == "__main__":
    main()
