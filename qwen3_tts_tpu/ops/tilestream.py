"""Shared weight-tile streaming planner for the fused decode kernels.

Both single-dispatch decode kernels (ops/talker_step.py for the talker
stack, ops/subtalker_frame.py for the code predictor) are HBM-bandwidth
bound: every step must stream the whole int8 weight set. The planner slices
each weight matrix into LARGE tiles (~4 MB — whole matrices where they fit)
and schedules the DMAs with a double-buffered pipeline per tile shape.

Tile size is the lever that reaches the DMA floor: with (1024,1024) tiles
the per-tile scalar issue/wait cost (~2 us) exceeds the ~1.3 us DMA and the
kernels become overhead-bound (measured on v5e: step time flat in cache
length); at ~4 MB per tile the ~5 us DMA hides all scalar work.

Pipeline discipline (HW-validated in the sub-talker kernels): the successor
entry's DMA is started BEFORE waiting on the current entry — with two slots
per shape the successor lands in the other slot, and the DMA that reuses the
current slot (two entries later) is issued after this tile's reads in
program order, so Mosaic's write-after-read ordering keeps it safe.
"""

from __future__ import annotations

MAX_TILE_BYTES = 4 << 20   # per-tile DMA target (~5 us at v5e HBM bandwidth)


def tile_shape(in_w: int, out_w: int,
               max_bytes: int = MAX_TILE_BYTES) -> tuple[int, int]:
    """Largest (in, out) tile <= max_bytes, splitting the out dim first
    (keeps full-depth accumulation-free columns where possible)."""
    ot = out_w
    while in_w * ot > max_bytes and ot % 2 == 0 and ot > 256:
        ot //= 2
    it = in_w
    while it * ot > max_bytes and it % 2 == 0 and it > 512:
        it //= 2
    return it, ot


def plan_matrix(sched: list, kind: str, l: int, in_w: int, out_w: int) -> None:
    """Append (kind, l, in_off, in_sz, out_off, out_sz) tiles for one matrix
    in the exact order `TileStream.matmul` consumes them."""
    it, ot = tile_shape(in_w, out_w)
    for o0 in range(0, out_w, ot):
        for i0 in range(0, in_w, it):
            sched.append((kind, l, i0, it, o0, ot))


def plan_groups(sched: list):
    """Group tiles by shape for per-shape double buffers. Returns
    (shapes ordered, per-entry (shape_idx, slot), per-entry successor,
    prime list)."""
    shapes: list = []
    per_group: dict = {}
    slot_of = []
    pos_of = []
    for i, (_, _, _, it, _, ot) in enumerate(sched):
        g = (it, ot)
        if g not in per_group:
            per_group[g] = []
            shapes.append(g)
        lst = per_group[g]
        slot_of.append((shapes.index(g), len(lst) % 2))
        pos_of.append(len(lst))
        lst.append(i)
    nxt = []
    for i, (_, _, _, it, _, ot) in enumerate(sched):
        lst = per_group[(it, ot)]
        p = pos_of[i]
        nxt.append(lst[p + 1] if p + 1 < len(lst) else None)
    prime = [lst[0] for lst in per_group.values()]
    return shapes, slot_of, nxt, sorted(prime)


class TileStream:
    """Kernel-side helper walking a plan; wraps DMA start/wait bookkeeping.

    arrays: kind -> ANY-space ref, sliced [l, i0:i0+it, o0:o0+ot] (or 2D for
    layer-less kinds); wbufs/wsems: per-shape (2, it, ot) scratch + DMA sems.
    """

    def __init__(self, sched, shapes, slot_of, nxt, prime, arrays,
                 wbufs, wsems, layerless=()):
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        self._jnp = jnp
        self._pl = pl
        self._pltpu = pltpu
        self.sched = sched
        self.slot_of = slot_of
        self.nxt = nxt
        self.arrays = arrays
        self.wbufs = wbufs
        self.wsems = wsems
        self.layerless = set(layerless)
        self.cursor = 0
        for i in prime:
            self._dma(i).start()

    def _dma(self, i):
        kind, l, i0, it, o0, ot = self.sched[i]
        ref = self.arrays[kind]
        pl = self._pl
        src = (ref.at[pl.ds(i0, it), pl.ds(o0, ot)]
               if kind in self.layerless
               else ref.at[l, pl.ds(i0, it), pl.ds(o0, ot)])
        g, slot = self.slot_of[i]
        return self._pltpu.make_async_copy(src, self.wbufs[g].at[slot],
                                           self.wsems[g].at[slot])

    def next_tile(self):
        i = self.cursor
        self.cursor += 1
        if self.nxt[i] is not None:
            self._dma(self.nxt[i]).start()  # other slot; before this wait
        self._dma(i).wait()
        g, slot = self.slot_of[i]
        return self.wbufs[g][slot].astype(self._jnp.bfloat16)

    def matmul(self, b: int, h_full, in_w: int, out_w: int, scale_row):
        """Tiled matmul consuming the stream in plan_matrix's emit order:
        (b, in_w) @ streamed int8 tiles -> (b, out_w) f32, scaled per out
        column."""
        jnp = self._jnp
        import jax

        it, ot = tile_shape(in_w, out_w)
        outs = []
        for o0 in range(0, out_w, ot):
            acc = jnp.zeros((b, ot), jnp.float32)
            for i0 in range(0, in_w, it):
                w = self.next_tile()
                acc = acc + jnp.dot(h_full[:, i0:i0 + it], w,
                                    preferred_element_type=jnp.float32)
            outs.append(acc * scale_row[o0:o0 + ot][None, :])
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
