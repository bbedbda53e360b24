"""Engine configuration.

The reference has no config system (SURVEY.md §5: the only knobs are the Polars
thread-pool size and a compile-time buffer length, src/expressions/strsim.rs:7,53,73).
The TPU engine makes its knobs explicit in one dataclass: bucket edges, batch
rounding, kernel implementation selection, mesh shape, and overflow policy.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class StrsimConfig:
    # Length buckets (chars). A row pair lands in the smallest bucket that fits
    # max(len_a, len_b); the Levenshtein wavefront cost is O(L^2), so tight
    # buckets are the difference between paying 64^2 and 512^2 per short name.
    # ~1.5x ladder caps padded-length waste (2.25x on O(L^2) work); edges are
    # ≡ 7 (mod 8) so the wavefront's [L+1, B] state exactly fills int32
    # sublane tiles (L+1 multiple of 8) — a 2x traffic cut for small buckets.
    # Compiles per extra edge amortize through the persistent compile cache.
    buckets: Tuple[int, ...] = (7, 15, 23, 31, 47, 63, 95, 127, 191, 255, 383, 511)

    # Rows longer than the largest bucket: "oracle" computes them on host with
    # the pure-Python oracle (exact, slow — these are rare outliers); "extend"
    # grows ad-hoc power-of-two buckets on device.
    overflow_policy: str = "extend"
    max_extend_len: int = 16384

    # Batch sizes are rounded up (pow2, then multiples of max_batch_block) to
    # bound the jit compile cache; padded rows are zero-length and masked out.
    # Large blocks amortize per-round-trip relay latency (the dominant cost on
    # tunneled TPUs); per-block memory stays modest ([256k, 2*64] int8 = 32MB).
    min_batch: int = 8
    max_batch_block: int = 262144

    # Kernel implementation per measure family.
    #   levenshtein: "auto" (production default — "pallas_scan" on TPU at
    #     widths <= 63, "myers" otherwise), "myers" (bit-parallel column DP;
    #     "xla" is an alias), "pallas_scan" (VMEM-resident Myers scan with
    #     in-kernel Eq, ops/levenshtein_pallas_scan.py — measured +13..178%
    #     over "myers" on v5e), "wavefront"
    #     (round-1 anti-diagonal DP), "pallas" (round-1 experimental
    #     wavefront, interpret-only).
    #   jaro: "auto" (production default) routes to the fused Pallas kernel
    #     (ops/jaro_pallas_scan.py: in-kernel EqB + VMEM greedy scan +
    #     rank-compacted O(L) transposition) on TPU by tile dtype and the
    #     bucket's measured max codepoint (pipeline._narrow_bucket):
    #     int8/ASCII tiles → byte compaction ("pallas_scan", every ladder
    #     width); int32 tiles with max codepoint < 2^16 (whole BMP) →
    #     halfword compaction ("pallas_scan_h", widths <= 95); astral
    #     codepoints → one-char-per-word ("pallas_scan_f", widths <= 63);
    #     anything else (wider buckets, unknown max_char, non-TPU) →
    #     "bitmask". Cutoffs measured on v5e (tools/ab_jaro_unicode.py).
    #     Forcing a value bypasses the routing guards — in particular,
    #     forcing "pallas_scan_h" on tiles with codepoints >= 2^16 silently
    #     corrupts the transposition count (two codepoints share a 32-bit
    #     slot; see ops/stats.py contract note; STRSIM_DEBUG_PACK_CONTRACT=1
    #     enables a host-side tile-max check). Other values: "bitmask"
    #     (packed-flag greedy scan + loop-free transposition; "xla" is an
    #     alias), "scan" (round-1 [L,B]-flag scan), "pallas" (round-2
    #     scan-only experiment).
    #   multiset: "auto" (production default — "pallas_scan" on TPU at
    #     widths <= 63; "pallas_hist" for wide int8/ASCII buckets (dynamic-
    #     range histogram, O(range*L) — ops/multiset_pallas.py); "chunked"
    #     otherwise), "pallas_scan" (unrolled
    #     VMEM-resident occurrence-rank kernel, ops/multiset_pallas.py —
    #     measured +30..130% over "chunked" on v5e,
    #     tools/ab_multiset_pallas.py), "chunked" (G i-positions per fused
    #     [G,L,B] compare-reduce step, G bucket-dependent — fastest XLA
    #     variant in every width band, tools/ab_multiset_chunked.py),
    #     "xla" (streaming 1-position-per-step scan), "table" ([L,L,B]
    #     compare).
    levenshtein_impl: str = "auto"
    jaro_impl: str = "auto"
    multiset_impl: str = "auto"
    # osa (extension): "auto" = Pallas VMEM-resident Hyyrö scan on TPU at
    # widths <= 63 (measured +29..157% over the XLA kernel on v5e,
    # tools/ab_osa_pallas.py), XLA kernel elsewhere; "myers" | "pallas_scan"
    # force one.
    osa_impl: str = "auto"
    # bigram multiset (extension: jaccard_bigram / sorensen_dice_bigram):
    # "auto" = Pallas unrolled occurrence-rank kernel on TPU at widths <= 63
    # (16-bit packed tokens on int8 tiles — ops/bigram_pallas.py), XLA scan
    # elsewhere; "xla" | "pallas_scan" force one.
    bigram_impl: str = "auto"
    # lcs (extension: lcs_seq / indel): "auto" = the same-orientation fused
    # DP Pallas kernel on TPU through width 512 (ops/dp_fused_pallas.py —
    # unrolled <= 63, fori_loop wide variant beyond; also fuses with
    # osa/levenshtein when the stat set wants them), the XLA Allison-Dix
    # kernel elsewhere; "xla" | "pallas_scan" force one.
    lcs_impl: str = "auto"
    # Host finalize: threaded C++ finalize+scatter (exact reference-order
    # f64, bit-identical to ops/finalize.py — tests/test_native.py) when the
    # native library is available; False forces the numpy finalizers.
    native_finalize: bool = True

    # Pallas grid block size (rows per grid step). Must be a multiple of 8.
    pallas_block_rows: int = 256

    # Narrow tiles: buckets whose codepoints all fit int8 (pure ASCII, the
    # common case for name data) ship as int8 — 4x less host->device traffic.
    narrow_tiles: bool = True

    # Skip-equal fast path: detect byte-equal pairs host-side and emit 1.0
    # without touching the device (reference does the same per-row,
    # src/expressions/strsim.rs:128,182,288,324).
    equal_fast_path: bool = True

    # Guarded compilation: kernels AOT-compile in background threads; if a
    # compile hasn't finished within this many seconds (flaky remote-compile
    # tunnels can hang requests), the affected rows fall back to the exact
    # host path ("native" C++ kernels, or "oracle" pure Python) instead of
    # blocking. None disables the deadline.
    compile_timeout_s: Optional[float] = 300.0
    fallback: str = "native"

    # Device EXECUTION deadline (uploads/dispatches/fetches): a wedged
    # interconnect can hang individual device calls indefinitely; past this
    # deadline the affected bucket falls back to the exact host path. Generous
    # by default — slow-but-progressing device phases must not trip it.
    execute_timeout_s: Optional[float] = 600.0

    # Small-input short-circuit: when at most this many rows need kernel math,
    # score them on the exact multi-core native host path and never touch the
    # device — cold-start compiles + tunnel round-trips cost seconds, while
    # the native path clears thousands of rows in single-digit milliseconds
    # (the 6-row README demo must not pay a 20-120s first compile). 0 disables
    # (tests force 0 so kernels stay exercised on tiny batches).
    host_short_circuit_rows: int = 8192

    # Mesh axis name used by the batch-sharded data-parallel layer.
    batch_axis: str = "data"

    # Multi-chip execution: number of local devices to shard the batch over
    # (None/1 → single device). Blocks are padded to a multiple of this and
    # placed with a batch-dim NamedSharding; XLA partitions the kernels with
    # zero collectives.
    data_parallel_devices: Optional[int] = None

    # Device placement: None → jax default.
    device: Optional[object] = None

    def bucket_for(self, max_len: int) -> int:
        for edge in self.buckets:
            if max_len <= edge:
                return edge
        if self.overflow_policy == "extend":
            edge = self.buckets[-1]
            while edge < max_len and edge <= self.max_extend_len:
                edge = edge * 2 + 1  # keep the L+1-multiple-of-8 alignment
            if max_len <= edge and edge <= self.max_extend_len:
                return edge
        return -1  # caller falls back to oracle (exact native host path)

    def replace(self, **kw) -> "StrsimConfig":
        return dataclasses.replace(self, **kw)


_CONFIG = StrsimConfig()


def get_config() -> StrsimConfig:
    return _CONFIG


def set_config(config: StrsimConfig) -> None:
    global _CONFIG
    _CONFIG = config
