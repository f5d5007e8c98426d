#!/usr/bin/env python
"""Re-baseline the query fingerprint snapshot (run at round start).

Usage:  python scripts/refresh_fingerprints.py

Must run at the START of a build round, BEFORE editing any queries:
at that moment the working tree equals the code the previous round's
driver draw ran against, so settled rows from that draw vouch for the
current fingerprints. See ``registry.refresh_fingerprints`` for the
exact update rule. After this, any query edited during the round will
fingerprint-mismatch and be steered to the front of the driver's next
correctness sample.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_traffict_prediction_spark import registry  # noqa: E402

# The refresh rule assumes the working tree equals the code the last
# driver draw ran against — true only at round start, before edits. A
# dirty tree means edits already happened; re-baselining now would
# vouch for code no draw has seen. Require --force to override.
dirty = subprocess.run(
    ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
).stdout.strip()
if dirty and "--force" not in sys.argv:
    sys.exit(
        "refusing to refresh: working tree is dirty (run at round START, "
        "before editing queries; --force to override)\n" + dirty
    )

snap = registry.refresh_fingerprints()
changed = sum(1 for v in snap.values() if v.get("round", 0) == 0)
print(f"snapshot: {len(snap)} names, {changed} never-settled, "
      f"written to big_data_traffict_prediction_spark/{registry._FINGERPRINT_FILE}")
