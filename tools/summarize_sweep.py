"""Condense a five-surface sweep's logs into committed, machine-readable
certification evidence (VERDICT r6 task 5: the r6 sweep's proof lived in
/tmp and died with the sandbox).

Reads <logdir>/<surface>.log for each surface leg that
tools/sweep_surfaces.sh ran (plus <logdir>/times.txt for wall times) and
writes certification/sweep_summary.json:

  {surface: {pass, rows_only, fail, wall_sec, verdict_line,
             fails: {query: first-line reason}}}

Per-query PASS rows are counted, not listed — the summary must stay
reviewable in a diff; failures are always listed in full.

Usage: python tools/summarize_sweep.py /tmp/sweep_r7 [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(REPO, "certification", "sweep_summary.json")


def parse_log(path: str) -> dict:
    n_pass = n_rows = 0
    fails: dict[str, str] = {}
    last = ""
    with open(path, errors="replace") as f:
        text = f.read().replace("\r", "\n")
    for line in text.splitlines():
        if line.startswith("PASS"):
            n_pass += 1
        elif line.startswith("ok?"):
            n_rows += 1
        elif line.startswith("FAIL"):
            m = re.match(r"FAIL\s+([^:]+):\s*(.*)", line)
            if m:
                fails[m.group(1).strip()] = m.group(2)[:300]
        if line.strip():
            last = line.strip()
    return {
        "pass": n_pass,
        "rows_only": n_rows,
        "fail": len(fails),
        "fails": fails,
        "verdict_line": last[:120],
    }


def main() -> int:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r7"
    out_path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT

    walls: dict[str, float] = {}
    times_path = os.path.join(logdir, "times.txt")
    if os.path.exists(times_path):
        for line in open(times_path):
            parts = line.split()
            if len(parts) == 3:
                walls[parts[0]] = round(float(parts[2]) - float(parts[1]), 1)

    surfaces = {}
    for f in sorted(os.listdir(logdir)):
        if not f.endswith(".log"):
            continue
        name = f[:-4]
        surfaces[name] = parse_log(os.path.join(logdir, f))
        if name in walls:
            surfaces[name]["wall_sec"] = walls[name]

    if not surfaces:
        print(f"no .log files in {logdir}")
        return 1

    # stamp what this sweep certifies (VERDICT r7 task 1): the git HEAD
    # the legs ran at and the registry size, so the evidence can never
    # silently lag the registry again
    import subprocess

    try:
        git_sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=REPO,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001
        git_sha = None
    try:
        sys.path.insert(0, REPO)
        import __spark_entry__ as entrymod

        n_registered = len(entrymod.queries())
        n_oracled = len(entrymod.oracle_sql())
    except Exception:  # noqa: BLE001
        n_registered = n_oracled = None

    summary = {
        "logdir": logdir,
        "git_sha": git_sha,
        "n_registered": n_registered,
        "n_oracled": n_oracled,
        "surfaces": surfaces,
        "all_green": all(s["fail"] == 0 for s in surfaces.values()),
        "counts_match_registry": all(
            s["pass"] + s["rows_only"] == n_registered
            for s in surfaces.values()
        ) if n_registered else None,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    for name, s in surfaces.items():
        print(f"  {name}: {s['pass']} pass, {s['rows_only']} rows-only, "
              f"{s['fail']} fail"
              + (f", {s['wall_sec']}s" if "wall_sec" in s else ""))
    return 0 if summary["all_green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
