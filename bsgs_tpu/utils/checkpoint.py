"""Checkpoint / resume of long range scans.

Replicates the reference's currentwork.txt semantics
(saveCurentCNT, 1_9_7File.pb:3897-3931; recovery :4634-4686): periodically
persist (pubkey-list position, pubkey, progress counter, config
fingerprint) atomically via temp+rename, refuse to resume when the
fingerprint of the solver geometry changed, and conservatively restart
from the minimum fully-completed epoch.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import tempfile
import time
from typing import Optional


def config_fingerprint(**params) -> str:
    """Stable SHA1 over the geometry parameters, like the reference's SHA1
    over (t,b,p,w,pk,pke,htsz) (1_9_7File.pb:3915-3917)."""
    blob = json.dumps(params, sort_keys=True).encode()
    return hashlib.sha1(blob).hexdigest()


@dataclasses.dataclass
class Checkpoint:
    fingerprint: str
    pub_index: int  # position in the multi-pubkey input list
    pubkey: str  # compressed hex of the pubkey being searched
    next_epoch: int  # first epoch NOT fully completed
    giant_steps: int
    wall_s: float
    ts: float = 0.0

    def save(self, path: str) -> None:
        self.ts = time.time()
        d = os.path.dirname(path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(dataclasses.asdict(self), f)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    @classmethod
    def load(cls, path: str, fingerprint: Optional[str] = None):
        with open(path) as f:
            d = json.load(f)
        ck = cls(**d)
        if fingerprint is not None and ck.fingerprint != fingerprint:
            raise ValueError(
                "checkpoint fingerprint mismatch — solver geometry changed "
                f"({ck.fingerprint} != {fingerprint})"
            )
        return ck


class CheckpointWriter:
    """Rate-limited checkpoint emitter (reference -wt interval, floor 30 s
    relaxed here to any interval; default 180 s like the reference)."""

    def __init__(self, path: str, fingerprint: str, interval_s: float = 180.0):
        self.path = path
        self.fingerprint = fingerprint
        self.interval_s = interval_s
        self._last = 0.0
        self._t0 = time.time()

    def maybe_write(self, pub_index: int, pubkey: str, next_epoch: int,
                    giant_steps: int, force: bool = False) -> bool:
        now = time.time()
        if not force and now - self._last < self.interval_s:
            return False
        Checkpoint(
            fingerprint=self.fingerprint,
            pub_index=pub_index,
            pubkey=pubkey,
            next_epoch=next_epoch,
            giant_steps=giant_steps,
            wall_s=now - self._t0,
        ).save(self.path)
        self._last = now
        return True
