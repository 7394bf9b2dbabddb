"""V5: duplicate-run check (``spark.json:8`` duplicateRunCheck).

Idempotency guard: refuse to reprocess the same input. The run is
fingerprinted by its input paths + file sizes + mtimes (content identity
without reading the data); fingerprints are recorded in a tiny JSON ledger
under the job's temp path. On a cluster the ledger lives on the object
store next to the checkpoints (``s3TempPath``, spark.json:9).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os


def input_fingerprint(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(p for p in paths if p):
        for f in sorted(glob.glob(os.path.join(p, "**"), recursive=True) or [p]):
            if os.path.isfile(f):
                st = os.stat(f)
                h.update(f"{f}|{st.st_size}|{int(st.st_mtime)}".encode())
    return h.hexdigest()


class RunLedger:
    def __init__(self, ledger_dir: str):
        os.makedirs(ledger_dir, exist_ok=True)
        self.path = os.path.join(ledger_dir, "run_ledger.json")

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def seen(self, job_name: str, fingerprint: str) -> bool:
        return self._load().get(job_name) == fingerprint

    def record(self, job_name: str, fingerprint: str) -> None:
        ledger = self._load()
        ledger[job_name] = fingerprint
        with open(self.path, "w") as f:
            json.dump(ledger, f, indent=1)
