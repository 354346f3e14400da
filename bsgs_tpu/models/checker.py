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


def giant_indices(ctx: HitContext, code: int, t: int, j: int):
    """Giant indices m to examine for a decoded (code, t, j) hit."""
    c = job_center(ctx, t)
    if code == 1:
        return [c - j]  # + branch: M + O_j = Q0 - (c-j) S G
    if code == 2:
        return [c + j]  # - branch
    if code == 4:
        return [c - j, c + j]  # exact landing: M == +-O_j
    return [c]  # center probe


def verify_hit(ctx: HitContext, table: BabyTable, code: int, t: int, j: int):
    """Re-derive and exactly verify one hit record.

    Returns the private key k with k*G == Q if the hit is real, else None.
    Enumerates k0 = m*S +- r for every baby index r whose stored prefix
    matches the recomputed landing X (duplicate-walk like the reference,
    1_9_7File.pb:4266-4277), plus k0 = m*S for exact landings.
    """
    ms = giant_indices(ctx, code, t, j)
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
