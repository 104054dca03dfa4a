"""Write (or print) the query-registry snapshot fixture.

Usage: python tools/registry_snapshot.py --write
Run after ADDING a query so tests/test_registry_identity.py keeps
pinning the full registry (it exists to catch silent DROPS or oracle
edits during refactors, not to freeze growth).
"""

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zzzarchived_arxiv_fulltext_spark.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    REGISTRATION_ORDER,
)

FIXTURE = Path(__file__).resolve().parent.parent / "tests" / "fixtures" \
    / "registry_snapshot.json"


def snapshot() -> dict:
    return {
        "registration_order": list(REGISTRATION_ORDER),
        "oracles_md5": {k: hashlib.md5(v.encode()).hexdigest()
                        for k, v in sorted(ORACLES.items())},
        "n_queries": len(QUERIES),
    }


if __name__ == "__main__":
    snap = snapshot()
    if "--write" in sys.argv:
        FIXTURE.write_text(json.dumps(snap, indent=1) + "\n")
        print(f"wrote {FIXTURE} ({snap['n_queries']} queries)")
    else:
        print(json.dumps(snap, indent=1))
