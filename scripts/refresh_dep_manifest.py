"""Refresh tests/driver_verified_hashes.json — run as the LAST step of a
round, after all code changes are final and COMMITTED.

Usage: python scripts/refresh_dep_manifest.py <round>

Semantics: the driver's correctness gate runs on the round's final tree and
covers the first 50 registry entries. So at refresh time:
  * the working tree must be CLEAN (VERDICT r4 "what's wrong" #2: the
    stamp's trust window is "nothing changed between driver run and stamp";
    refusing dirty trees plus recording HEAD's sha makes that checkable
    instead of by-convention);
  * window queries (positions 0-49) get their CURRENT fingerprint stamped
    with <round> — the imminent driver run verifies exactly this state;
  * tail queries (position 50+) keep their previous round stamp, and this
    script REFUSES to proceed if any tail fingerprint changed — a changed
    tail fingerprint means the query's deps were edited after its last
    driver check, so it must be rotated into the window first;
  * AGE BOUND (VERDICT r4 "next round" #4): fingerprints are blind to
    Spark-version and testdata-layout changes, so a tail query whose last
    driver round is more than 2 rounds old must rotate into the window
    regardless of its fingerprint. This script refuses to stamp such an
    entry in the tail (tests/test_entry_contract.py enforces the same
    rule in CI).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.dep_fingerprint import all_fingerprints  # noqa: E402

MANIFEST = os.path.join(REPO, "tests", "driver_verified_hashes.json")
WINDOW = 50
MAX_AGE = 2  # rounds a query may sit in the tail without a fresh driver row


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True, check=True).stdout.strip()


def main(round_no: int) -> None:
    import __spark_entry__ as entrymod

    dirty = _git("status", "--porcelain")
    if dirty:
        sys.exit("refusing to refresh: working tree is dirty — commit all "
                 "code first so the recorded sha covers exactly the "
                 "fingerprinted state:\n" + dirty)
    sha = _git("rev-parse", "HEAD")

    names = list(entrymod.queries())
    cur = all_fingerprints()
    old = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            old = json.load(f)
    old.pop("_meta", None)

    out, errs = {}, []
    for i, n in enumerate(names):
        if i < WINDOW:
            out[n] = {"hash": cur[n], "round": round_no}
        else:
            prev = old.get(n)
            if prev is None:
                errs.append(f"{n}: tail query has no prior driver round")
            elif prev["hash"] != cur[n]:
                errs.append(f"{n}: fingerprint changed since round "
                            f"{prev['round']} — rotate it into the window")
            elif prev["round"] < round_no - MAX_AGE:
                errs.append(f"{n}: last driver row is round {prev['round']} "
                            f"(> {MAX_AGE} rounds old) — rotate it into "
                            "the window (age bound)")
            else:
                out[n] = prev
    if errs:
        sys.exit("refusing to refresh:\n  " + "\n  ".join(errs))

    out["_meta"] = {"round": round_no, "sha": sha}
    with open(MANIFEST, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}: {len(names)} queries, window stamped "
          f"r{round_no} at {sha[:12]}")


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    main(int(sys.argv[1]))
