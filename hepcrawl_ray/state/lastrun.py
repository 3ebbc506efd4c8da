"""Last-run store: incremental-harvest windows per (source, set).

The reference persists one JSON file per (spider, set) under
``LAST_RUNS_PATH/<spider>/sha1(metadataPrefix=...&set=...).json`` with
from/until/started/finished timestamps, and the next run resumes at
``from_date = until_date or last_run_finished_at``
(reference: hepcrawl/spiders/common/lastrunstore_spider.py:53-126,
fingerprint at hepcrawl/spiders/common/oaipmh_spider.py:236-237).

Same semantics here, used by the driver to window incremental seed
enumerations (the frontier's own exact state lives in its checkpoint;
this is the coarse per-set harvest window on top).
"""

from __future__ import annotations

import json
import os
from hashlib import sha1


class LastRunStore:
    def __init__(self, root: str, source: str):
        self.dir = os.path.join(root, source)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, set_id: str) -> str:
        fingerprint = sha1(f"set={set_id}".encode()).hexdigest()
        return os.path.join(self.dir, f"{fingerprint}.json")

    def save(self, set_id: str, *, from_date: str | None, until_date: str | None,
             started_at: str, finished_at: str) -> str:
        record = {
            "set_id": set_id, "from_date": from_date,
            "until_date": until_date, "last_run_started_at": started_at,
            "last_run_finished_at": finished_at,
        }
        path = self._path(set_id)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        return path

    def load(self, set_id: str) -> dict | None:
        try:
            with open(self._path(set_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def resume_from(self, set_id: str) -> str | None:
        """Next window start: until_date if set, else last finished_at
        (reference: lastrunstore_spider.py:119-126)."""
        last = self.load(set_id)
        if last is None:
            return None
        return last["until_date"] or last["last_run_finished_at"]
