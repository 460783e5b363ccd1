"""Refresh tests/driver_verified_hashes.json — run as the LAST step of a
round, after all code changes are final.

Usage: python scripts/refresh_dep_manifest.py <round>

Semantics: the driver's correctness gate runs on the round's final tree and
covers the first 50 registry entries. So at refresh time:
  * window queries (positions 0-49) get their CURRENT fingerprint stamped
    with <round> — the imminent driver run verifies exactly this state;
  * tail queries (position 50+) keep their previous round stamp, and this
    script REFUSES to proceed if any tail fingerprint changed — a changed
    tail fingerprint means the query's deps were edited after its last
    driver check, so it must be rotated into the window first
    (tests/test_entry_contract.py enforces the same rule in CI).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.dep_fingerprint import all_fingerprints  # noqa: E402

MANIFEST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "driver_verified_hashes.json")
WINDOW = 50


def main(round_no: int) -> None:
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    cur = all_fingerprints()
    old = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            old = json.load(f)

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
            else:
                out[n] = prev
    if errs:
        sys.exit("refusing to refresh:\n  " + "\n  ".join(errs))

    with open(MANIFEST, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}: {len(names)} queries, window stamped r{round_no}")


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    main(int(sys.argv[1]))
