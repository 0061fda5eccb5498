"""Multi-chip scaling-efficiency projection for the sharded keyswitch.

Real multi-chip hardware is unavailable in this build environment (one
tunneled v5e chip), so the BASELINE.md deliverable "scaling efficiency at
1 chip / 1 host / >= 2 hosts" is delivered as an explicit, auditable MODEL
fed by measured single-chip numbers and the per-step collective volumes
that `ShardedKeySwitch.comm_report()` counts.  The dryrun
(`__graft_entry__.dryrun_multichip`) evaluates it and prints the projected
efficiencies; doc/roofline.md documents the formula.

Model (RNS-limb sharding 'mp', one keyswitch op over P chips in lockstep):

    T_P = T1 * ( alpha * R_P / R_1  +  beta * E_P / E_1 )  +  T_comm(P)

* T1        — measured single-chip time per batch (driver bench, chained
              slope; ~9.1-9.4 ms per batch-32 at 16384_6_7_7_2).
* alpha     — transform fraction of T1 (~0.65, doc/roofline.md interleaved
              phase probe); beta = 1 - alpha is the MAC residue.
* R_1, R_P  — transform rows per op: single-chip R_1 = L + (L+1)L + c + cL
              (INTT1 + engine NTTs + INTT2 + tails); the worst chip at P
              shards replicates INTT1 (the intt1_forward.hpp:8 broadcast
              point, realized as replicated compute) and owns
              ceil((L+1)/P) engines:
              R_P = L + own*L + (c if owns_special) + c*own_decomp.
* E_1, E_P  — MAC terms (engine count proxy): E_1 = L+1, E_P = own.
* T_comm(P) — ring-collective model over the comm_report volumes:
              e-broadcast psum (all-reduce, 2X(P-1)/P bytes on the wire
              per chip) + owned-slice output all-gather (X(P-1)/P), at the
              part's per-chip ICI egress bandwidth.

Efficiency(P) = T1 / (P * T_P) — the throughput-per-chip ratio when P
chips cooperate on ONE op (latency sharding).  Batch sharding ('dp') has
no collectives at all (in_specs shard the batch; zero cross-chip bytes),
so its efficiency is 1.0 by construction on-host and across hosts — the
">= 80% at 4 hosts" deliverable is met by running dp across DCN and mp
inside each host's ICI domain.

ICI/DCN bandwidths are public spec-sheet approximations (How to Scale
Your Model, jax-ml.github.io/scaling-book): v5e ~4.5e10 B/s per link per
direction x 4 links; v5p ~9e10 x 6 links; DCN ~2.5e10 B/s per host.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import ceil

# per-chip aggregate ICI egress bandwidth, bytes/s (spec approximations)
ICI_BW = {
    "v5e": 4 * 4.5e10,
    "v5p": 6 * 9.0e10,
}
DCN_BW_PER_HOST = 2.5e10


@dataclass
class MpProjection:
    chips: int
    t1_ms: float          # measured single-chip ms per batch
    t_p_ms: float         # projected per-batch ms on the worst chip
    compute_ms: float
    comm_ms: float
    speedup: float        # T1 / T_P (latency gain)
    efficiency: float     # T1 / (P * T_P)


def keyswitch_mp_projection(
    P: int,
    t1_ms: float,
    batch: int,
    n: int = 16384,
    L: int = 6,
    comp: int = 2,
    alpha: float = 0.65,
    part: str = "v5e",
) -> MpProjection:
    """Project the RNS-limb-sharded keyswitch time on P chips (see module
    docstring).  t1_ms: measured single-chip per-batch time."""
    assert P >= 1
    K_eng = L + 1  # active engines: L decomp + the special modulus
    R1 = L + K_eng * L + comp + comp * L
    # mirror ShardedKeySwitch's slot layout exactly: engines padded to a
    # multiple of P, chip p owns per_shard consecutive slots
    engines = list(range(L)) + [K_eng - 1]
    while len(engines) % P:
        engines.append(-1)
    per_shard = len(engines) // P
    worst_rows, worst_eng = 0, 0
    for p in range(P):
        owned = [e for e in engines[p * per_shard : (p + 1) * per_shard]
                 if e >= 0]
        rows = L  # replicated INTT1
        for e in owned:
            rows += L  # engine NTT over all source limbs
            rows += comp  # special owner: INTT2; decomp owner: tail NTTs
        if rows > worst_rows:
            worst_rows, worst_eng = rows, len(owned)
    compute_ms = t1_ms * (
        alpha * worst_rows / R1 + (1 - alpha) * worst_eng / K_eng
    )
    # collective bytes (comm_report layout): plane = batch*(comp,n) u32 pair
    plane = batch * comp * n * 4 * 2
    out_bytes = L * plane
    bw = ICI_BW[part]
    ring = (P - 1) / P if P > 1 else 0.0
    comm_s = (2 * plane * ring + out_bytes * ring) / bw
    # per-collective dispatch latency floor (~10 us each, 2 collectives)
    comm_ms = comm_s * 1e3 + (0.02 if P > 1 else 0.0)
    t_p = compute_ms + comm_ms
    return MpProjection(
        chips=P, t1_ms=t1_ms, t_p_ms=round(t_p, 3),
        compute_ms=round(compute_ms, 3), comm_ms=round(comm_ms, 3),
        speedup=round(t1_ms / t_p, 2),
        efficiency=round(t1_ms / (P * t_p), 3),
    )


def keyswitch_hoisted_mp_projection(
    P: int,
    t1_ms: float,
    t1h_ms: float,
    batch: int,
    n: int = 16384,
    L: int = 6,
    comp: int = 2,
    alpha: float = 0.65,
    part: str = "v5e",
) -> MpProjection:
    """Project the SHARDED HOISTED apply on P chips
    (ShardedKeySwitch.hoist/run_hoisted): the decomposition already lives
    slot-sharded, so an apply runs {MAC over owned engines + INTT2 on the
    special owner + tails and the deferred automorphism on owned decomp
    slots} + the same two collectives as the full path.

    t1_ms: measured single-chip FULL keyswitch per-batch ms (calibrates
    the per-transform-row cost via alpha); t1h_ms: measured single-chip
    HOISTED apply per-batch ms (driver keyswitch_hoisted_device_op_per_s).
    The transform part scales with the worst chip's hoisted rows; the
    remaining residue (MAC + automorphism matmuls) scales with owned
    engines."""
    assert P >= 1
    K_eng = L + 1
    R1 = L + K_eng * L + comp + comp * L
    R1h = comp + comp * L  # hoisted apply rows: INTT2 + tails
    engines = list(range(L)) + [K_eng - 1]
    while len(engines) % P:
        engines.append(-1)
    per_shard = len(engines) // P
    row_ms = t1_ms * alpha / R1  # calibrated per-transform-row cost
    worst = 0.0
    worst_eng = 0
    resid_1 = t1h_ms - row_ms * R1h  # MAC + automorphism on one chip
    for p in range(P):
        owned = [e for e in engines[p * per_shard: (p + 1) * per_shard]
                 if e >= 0]
        rows = sum(comp for _ in owned)  # INTT2 (special) / tails (decomp)
        t = row_ms * rows + resid_1 * len(owned) / K_eng
        if t > worst:
            worst = t
            worst_eng = len(owned)
    plane = batch * comp * n * 4 * 2
    out_bytes = L * plane
    bw = ICI_BW[part]
    ring = (P - 1) / P if P > 1 else 0.0
    comm_ms = (2 * plane * ring + out_bytes * ring) / bw * 1e3 + (
        0.02 if P > 1 else 0.0
    )
    t_p = worst + comm_ms
    return MpProjection(
        chips=P, t1_ms=t1h_ms, t_p_ms=round(t_p, 3),
        compute_ms=round(worst, 3), comm_ms=round(comm_ms, 3),
        speedup=round(t1h_ms / t_p, 2),
        efficiency=round(t1h_ms / (P * t_p), 3),
    )


def dist_ntt_sp_projection(
    P: int,
    t1_ms: float,
    batch: int,
    n: int = 16384,
    part: str = "v5e",
    chunks: int = 4,
) -> MpProjection:
    """Coefficient-sharded MXU dist-NTT ('sp', dist_fwd_ntt_mxu): both
    matmul stages scale 1/P; the exact reduce_scatter of the int16 limb
    planes (~16 B/coefficient total, parallel/sharded.py) is the only
    collective.

    chunks mirrors the implementation's batch chunking: chunk c's
    psum_scatter overlaps chunk c+1's matmuls (async collectives +
    latency-hiding scheduler), so only ~1/chunks of whichever is SMALLER
    (compute or comm) stays exposed — the standard software-pipelining
    bound T = max(A, B) + min(A, B)/C.  chunks=1 reproduces the round-4
    serialized model (eff 0.27 at P=8)."""
    compute_ms = t1_ms / P
    bytes_total = batch * n * 16
    ring = (P - 1) / P if P > 1 else 0.0
    comm_ms = bytes_total * ring / ICI_BW[part] * 1e3
    C = max(1, int(chunks))
    if P > 1:
        t_p = (
            max(compute_ms, comm_ms)
            + min(compute_ms, comm_ms) / C
            + 0.01 * C  # per-chunk collective dispatch floor
        )
    else:
        t_p = compute_ms
    return MpProjection(
        chips=P, t1_ms=t1_ms, t_p_ms=round(t_p, 4),
        compute_ms=round(compute_ms, 4), comm_ms=round(comm_ms, 4),
        speedup=round(t1_ms / t_p, 2),
        efficiency=round(t1_ms / (P * t_p), 3),
    )


def report(t1_ks_ms: float = 9.4, ks_batch: int = 32,
           t1_ntt_ms: float = 15.2, ntt_batch: int = 4096,
           t1_hoisted_ms: float = 6.3,
           part: str = "v5e") -> str:
    """Human-readable projection block for the dryrun log (defaults: the
    round-4 driver medians; t1_hoisted_ms from
    keyswitch_hoisted_device_op_per_s)."""
    lines = [
        f"scaling projection ({part}; model: parallel/projection.py, "
        f"doc/roofline.md):",
        "  dp (batch sharding, throughput): zero collectives -> efficiency "
        "1.00 at any chip/host count; >=80% at 4 hosts holds by "
        "construction (DCN carries no per-op bytes)",
    ]
    for P in (2, 4, 8):
        p = keyswitch_mp_projection(P, t1_ks_ms, ks_batch, part=part)
        lines.append(
            f"  mp (keyswitch latency) P={P}: {p.t_p_ms} ms/batch "
            f"(compute {p.compute_ms} + comm {p.comm_ms}) "
            f"speedup {p.speedup}x eff {p.efficiency:.2f}"
        )
    for P in (2, 4, 8):
        p = keyswitch_hoisted_mp_projection(
            P, t1_ks_ms, t1_hoisted_ms, ks_batch, part=part
        )
        lines.append(
            f"  hoisted-mp (rotation latency) P={P}: {p.t_p_ms} ms/batch "
            f"(compute {p.compute_ms} + comm {p.comm_ms}) "
            f"speedup {p.speedup}x eff {p.efficiency:.2f}"
        )
    for P in (2, 4, 8):
        p = dist_ntt_sp_projection(P, t1_ntt_ms, ntt_batch, part=part)
        lines.append(
            f"  sp (dist-NTT n=16384, B={ntt_batch}) P={P}: "
            f"{p.t_p_ms} ms/batch (comm {p.comm_ms}) "
            f"speedup {p.speedup}x eff {p.efficiency:.2f}"
        )
    return "\n".join(lines)
