#!/usr/bin/env python
"""Driver-window rotation planner.

The grading driver's CORRECTNESS gate verifies the FIRST 50 manifest
entries in alphabetical order. This script computes, against the LIVE
registry, the accumulated CORRECTNESS_r*.json history, AND git history,
which entries most need a fresh driver row, and solves for the minimal
alias set (prefix sorts ahead of every canonical name) that puts all of
them inside the 50-slot window.

Freshness keys, in priority order (VERDICT r4 next-round #1):
  1. never   — no driver row in any round;
  2. changed — the entry's implementing file has a commit AFTER the
     end-of-round snapshot of the round that last checked it (the code
     the driver verified is not the code in the tree);
  3. stale   — last driver row is >= 2 rounds old (evidence rot).

"changed" is computed from git: each registered builder resolves to its
source file (inspect), the file's last-touching commit is compared
against the ``round N: end-of-round snapshot`` boundary commit of the
entry's last-checked round with ``git merge-base --is-ancestor``.

Run it whenever manifest entries are added/removed, and paste the emitted
list into ``limeqo_spark.manifest._ROTATION_R<N>``.

Usage: python scripts/rotation_plan.py [--window 50] [--prefix a5_]
"""

from __future__ import annotations

import argparse
import glob
import inspect
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout.strip()


def round_boundaries() -> dict[int, str]:
    """Round -> the commit whose tree the driver's round-N CORRECTNESS run
    checked. The driver wrote explicit ``round N: end-of-round snapshot``
    commits only through round 5; from round 6 the only per-round marker
    is the ``round N: verdict/advice/correctness/bench`` artifact commit,
    which lands immediately after the driver verified the round's tree —
    so any file commit NOT reachable from it is definitely unverified.
    Without this fallback, entries last-checked in r6+ were never flagged
    as changed-after-check (found r8: the dedup family escaped the window
    after dedup.py changed)."""
    out: dict[int, str] = {}
    log = _git("log", "--format=%H %s")
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith("round ") and (
            "end-of-round snapshot" in subject
            or "verdict/advice/correctness" in subject
        ):
            try:
                rnd = int(subject.split()[1].rstrip(":"))
            except ValueError:
                continue
            out.setdefault(rnd, sha)  # log is newest-first; keep the newest
    return out


def entry_source_file(spec) -> str | None:
    try:
        f = inspect.getsourcefile(spec.builder)
        return os.path.relpath(f, REPO) if f else None
    except TypeError:
        return None


def changed_after(sha_boundary: str, path: str) -> bool:
    """True when ``path`` has a commit NOT reachable from the boundary."""
    last = _git("log", "-1", "--format=%H", "--", path)
    if not last:
        return False  # untracked/new file: counted as never-checked instead
    rc = subprocess.run(
        ["git", "merge-base", "--is-ancestor", last, sha_boundary],
        cwd=REPO,
        capture_output=True,
    ).returncode
    return rc != 0


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--prefix", default=None, help="alias prefix for the NEXT round")
    args = ap.parse_args()

    import limeqo_spark.manifest as m

    # every rotation prefix ever used (r10 bug: the hardcoded a3_-a9_ set
    # missed a10_, so r10's alias rows were not credited to their
    # canonical entries and the aliases themselves were counted as
    # canonical — the planner re-emitted the ENTIRE r10 window)
    known_prefixes = tuple(sorted({f"a{i}_" for i in range(3, 100)}))
    checked_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        for key in json.load(open(path)):
            name = key
            for p in known_prefixes:
                if name.startswith(p):
                    name = name[len(p):]
            checked_round[name] = max(checked_round.get(name, 0), rnd)

    canon = sorted(n for n in m.REGISTRY if not n.startswith(known_prefixes))
    never = [n for n in canon if n not in checked_round]
    latest = max(checked_round.values(), default=0)

    boundaries = round_boundaries()
    changed: list[str] = []
    for n in canon:
        rnd = checked_round.get(n)
        if not rnd:
            continue
        boundary = boundaries.get(rnd)
        src = entry_source_file(m.REGISTRY[n])
        if boundary and src and changed_after(boundary, src):
            changed.append(n)
    # Oldest driver evidence first: when changed > window (r9: a session
    # touching dedup/similarity/workload re-flags whole families), the
    # tail-pop must discard entries whose last green row is RECENT, not
    # whichever sorts alphabetically last.
    changed.sort(key=lambda n: (checked_round[n], n))

    stale = sorted(
        (
            n
            for n in canon
            if 0 < checked_round.get(n, 0) <= latest - 2 and n not in changed
        ),
        # Stalest first: when the window overflows, the tail-pop below must
        # discard the LEAST stale (r6 bug: alphabetical order dropped the
        # r3-checked text_* family while keeping r4-checked entries).
        key=lambda n: (checked_round[n], n),
    )

    # Global OLDEST-evidence-first (VERDICT r10 #1): merge changed+stale
    # by last-checked round, changed before stale only WITHIN a round.
    # The old changed-then-stale ordering let a recently-verified entry
    # whose file was touched displace the r5-era never-revisited families
    # (mm_* sat out three windows that way).
    backlog = sorted(
        set(changed) | set(stale),
        key=lambda n: (checked_round[n], 0 if n in set(changed) else 1, n),
    )
    want: list[str] = list(never)
    for n in backlog:
        if n not in want:
            want.append(n)

    # fit: aliases sort ahead of canon; the rest of the window is the canon
    # prefix. Drop lowest-priority (stale tail) names if the window is tight.
    while True:
        aliases: set[str] = set()
        for _ in range(len(canon) + 1):
            natural = set(canon[: max(0, args.window - len(aliases))])
            new = {n for n in want if n not in natural}
            if new == aliases:
                break
            aliases = new
        natural_list = canon[: max(0, args.window - len(aliases))]
        uncovered = [n for n in want if n not in aliases and n not in natural_list]
        if not uncovered and len(aliases) <= args.window:
            break
        dropped = want.pop()  # lowest-priority tail
        print(f"note: window full, dropping stale '{dropped}'", file=sys.stderr)

    report = {
        "registry_size": len(canon),
        "never_checked": never,
        "changed_after_last_check": changed,
        f"stale (last check <= r{latest - 2})": stale,
        "aliases_needed": sorted(aliases),
        "natural_window": natural_list,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
