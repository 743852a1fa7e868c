"""Object-store-shaped commit-claim double.

``TxTable``'s commit claim is pluggable (txtable.py ``_link_claim``
documents the S3/GCS mapping: conditional PUT — ``If-None-Match: *`` /
``x-goog-if-generation-match: 0`` — with a three-way outcome of
claimed / lost / unknown). This module EXECUTES that contract over a
local directory so the full concurrency suite can run against
object-store semantics instead of narrating them:

- the claim is a PUT of the full manifest BYTES (the caller's temp
  file is the request body, not the object — unlike ``os.link``, the
  stored object is an independent copy, like S3);
- put-if-absent: the object materializes atomically under the target
  name or the claim reports lost (412 Precondition Failed). Local
  emulation: write the bytes to a private staging file, then
  ``os.link`` it into place — real object stores make the whole PUT
  visible atomically, which a byte-for-byte ``open(..., "x")`` write
  would NOT (a concurrent reader could observe a torn manifest), so
  the link stands in for the store's atomic visibility;
- injected LATENCY before the claim widens the race window the way a
  slow network does;
- injected LOST ACKS raise ``ClaimOutcomeUnknown`` — either AFTER the
  PUT landed (timeout on the response: the object exists, the writer
  doesn't know) or BEFORE it was sent (connection refused): the
  ``_commit`` recovery path must read the object back and compare
  commit ids, never assume either outcome.
"""

from __future__ import annotations

import os
import random
import time
import uuid

from .txtable import ClaimOutcomeUnknown


class DirectoryConditionalPutClaim:
    """Callable claim with the ``claim(tmp, target) -> bool`` contract
    of ``txtable._link_claim``, emulating a conditional PUT with
    injectable latency and lost acks. Deterministic per ``seed``.

    ``lost_ack_rate``: probability a claim attempt raises
    ``ClaimOutcomeUnknown``; half of those land the PUT first (ack
    lost on the response), half fail before sending (nothing landed).
    """

    def __init__(
        self,
        latency_s: float = 0.0,
        lost_ack_rate: float = 0.0,
        seed: int = 0,
    ):
        self.latency_s = latency_s
        self.lost_ack_rate = lost_ack_rate
        self.rng = random.Random(seed)
        self.puts = 0
        self.lost_acks = 0

    def __call__(self, tmp, target) -> bool:
        if self.latency_s:
            time.sleep(self.rng.uniform(0, self.latency_s))
        drop = self.rng.random() < self.lost_ack_rate
        drop_before = drop and self.rng.random() < 0.5
        if drop_before:
            self.lost_acks += 1
            raise ClaimOutcomeUnknown("connection lost before the PUT")
        # the PUT: an independent copy of the manifest bytes,
        # materialized atomically-if-absent under the target name
        with open(tmp, "rb") as f:
            body = f.read()
        staging = os.path.join(
            os.path.dirname(str(target)), f".put-{uuid.uuid4().hex}.json"
        )
        with open(staging, "wb") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(staging, str(target))
            claimed = True
        except FileExistsError:
            claimed = False
        finally:
            os.unlink(staging)
        self.puts += 1
        if drop:
            self.lost_acks += 1
            raise ClaimOutcomeUnknown("ack lost after the accepted PUT")
        return claimed
