"""Host-side exact verification of device hit records.

The TPU is never trusted: every hit record is re-derived from scratch with
exact Python-integer EC arithmetic and only accepted if k*G equals the
target pubkey — the same philosophy as the reference's async checkerThread
(1_9_7File.pb:3933-4296), whose hit-code candidate enumeration this module
re-derives for the epoch-scan job layout.
"""

from __future__ import annotations

import dataclasses

from ..utils import ecpy
from .table import BabyTable


@dataclasses.dataclass(frozen=True)
class HitContext:
    """Geometry needed to decode a (t, flat) device record.

    q: target pubkey point (affine ints); pk: range start; s: giant stride
    (2w); n: offsets per job; job_base: global index of job t=0 in this
    epoch (jobs cover giant indices m in [g*(2N+1), (g+1)*(2N+1)) with
    center c_g = g*(2N+1) + N).
    """

    q: tuple
    pk: int
    s: int
    n: int
    job_base: int


def job_center(ctx: HitContext, t: int) -> int:
    return (ctx.job_base + t) * (2 * ctx.n + 1) + ctx.n


def decode_record(ctx: HitContext, t: int, flat: int):
    """-> (code, list of giant indices m to examine)."""
    n = ctx.n
    c = job_center(ctx, t)
    if flat < n:
        return 1, [c - (flat + 1)]  # + branch: M + O_j = Q0 - (c-j) S G
    if flat < 2 * n:
        return 2, [c + (flat - n + 1)]  # - branch
    if flat < 3 * n:
        j = flat - 2 * n + 1
        return 4, [c - j, c + j]  # exact landing: M == +-O_j
    return 5, [c]  # center probe


def verify_hit(ctx: HitContext, table: BabyTable, t: int, flat: int):
    """Re-derive and exactly verify one hit record.

    Returns the private key k with k*G == Q if the hit is real, else None.
    Enumerates k0 = m*S +- r for every baby index r whose stored prefix
    matches the recomputed landing X (duplicate-walk like the reference,
    1_9_7File.pb:4266-4277), plus k0 = m*S for exact landings.
    """
    code, ms = decode_record(ctx, t, flat)
    q0 = ecpy.sub(ctx.q, ecpy.mul(ctx.pk))  # Q - pk*G
    for m in ms:
        if m < 0:
            continue
        candidates = []
        if code == 4:
            candidates.append(m * ctx.s)
        else:
            landing = ecpy.sub(q0, ecpy.mul(m * ctx.s))
            if landing is None:
                candidates.append(m * ctx.s)
            else:
                for r in table.lookup_positions(landing[0]):
                    candidates.append(m * ctx.s + r)
                    candidates.append(m * ctx.s - r)
        for k0 in candidates:
            k = (ctx.pk + k0) % ecpy.N
            if ecpy.mul(k) == ctx.q:
                return k
    return None
