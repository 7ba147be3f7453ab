"""Two-stage UFPMP inference pipeline (the north-star path).

Behavioral reference: ``yolox-ufp/ufpmp_det_eval.py:208-338`` —
per image: coarse detector on the full frame -> concat per-class boxes ->
``UnifiedForegroundPacking(scale=1.5)`` -> mosaic assembly -> MP-Det on
the mosaic -> chip unmapping with IoF>0.9 gating -> per-class NMS@0.6 ->
COCO-format detections (COCOeval maxDets=[10,100,500]).

TPU-first structure:
- stage-1 and stage-2 forwards are two jitted programs with static
  shapes; mosaic sizes are bucketed (SURVEY.md §7 hard parts) so stage-2
  compiles once per bucket;
- packing runs on host (microseconds, inherently sequential);
- mosaic pixel assembly, unmapping, IoF gating and the final NMS are
  on-device fixed-shape ops.
"""

from __future__ import annotations

import functools
import itertools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.eval.postprocess import gfl_postprocess, yolox_postprocess
from glsdet_tpu.ops.nms import NEG_INF, batched_nms
from glsdet_tpu.ufp.assembly import (
    assemble_mosaic_tiled_batch,
    regions_to_array,
    split_rows_for_tile,
    unmap_chip_detections_argmax,
)
from glsdet_tpu.ufp.pallas_paint import (
    assemble_mosaic_pallas_batch,
    build_tile_tables,
    build_tile_tables_jax,
    tile_max_count,
)
from glsdet_tpu.native import (
    unified_foreground_packing_rows,
    unified_foreground_packing_rows_fit,
)


def _prefetch(arr) -> None:
    """Start the device->host copy of a (possibly still computing) jax
    array without blocking.  ``np.asarray`` later is the sync point; the
    prefetch overlaps the wire time of one result with host work on
    another (each readback on a tunneled TPU pays a ~30ms RPC floor)."""
    try:
        arr.copy_to_host_async()
    except Exception:
        pass

# Model-canvas buckets: multiples of 128 (the coarsest pyramid stride,
# and the painter's planar lane width).  MP-Det forward cost scales with
# bucket area, so the ladder is denser around the common VisDrone
# packing sizes (~1000-1400 px); painting alignment is handled
# separately (paint_hw_for), so buckets need not be 256-multiples.
DEFAULT_BUCKETS = (768, 1024, 1152, 1280, 1536, 1792, 2688)


def pick_bucket(h: float, w: float, buckets: Sequence[int]) -> int:
    """Smallest bucket covering (h, w); mosaics beyond the largest bucket
    are assembled clipped (reference mosaics are bounded at ~2666 wide)."""
    need = max(h, w)
    for b in buckets:
        if need <= b:
            return b
    return buckets[-1]


def paint_tile(out_hw: int) -> int:
    """Painter window size for a canvas bucket (multiple of 4, <= canvas).

    256 balances per-row HBM traffic (~tile^2) against the extra rows
    that splitting large chips produces (split_rows_for_tile)."""
    return min(256, out_hw) // 4 * 4


def paint_hw_for(hw: int) -> int:
    """Painting canvas size for a model bucket ``hw``: the next
    ``paint_tile`` multiple.

    The pallas painter owns aligned (256, 256) canvas tiles, so painting
    happens at the next 256-multiple and the canvas is cropped back to
    ``hw`` before the normalize + MP-Det chain (the crop fuses into the
    normalize read).  This decouples the MODEL canvas — whose area sets
    the dominant MP-Det forward cost and only needs 128-alignment for
    the stride-128 pyramid level and the painter's planar lane layout —
    from the PAINT canvas alignment.  A 1152 bucket therefore runs
    MP-Det on 0.81x the pixels of the 1280 bucket while still painting
    with the fast tile-owning kernel (previously any bucket not
    divisible by 256 fell back to the ~4x slower XLA scan painter)."""
    t = paint_tile(hw)
    return -(-hw // t) * t


def pack_detections(boxes, scores, labels, valid) -> jnp.ndarray:
    """Pack a detection set into ONE (..., K, 7) array
    ``[x1, y1, x2, y2, score, label, valid]``.

    The readback of a detection set is 4 host transfers as separate
    arrays; on a remote-tunnel TPU every transfer pays the ~30ms RPC
    floor, so the pipeline programs return this packed form and the host
    unpacks with ``unpack_detections`` after a single transfer."""
    return jnp.concatenate([
        boxes.astype(jnp.float32),
        scores.astype(jnp.float32)[..., None],
        labels.astype(jnp.float32)[..., None],
        valid.astype(jnp.float32)[..., None]], axis=-1)


def unpack_detections(packed: np.ndarray) -> dict:
    """numpy twin of ``pack_detections`` -> dict of views."""
    packed = np.asarray(packed)
    return {
        "boxes": packed[..., :4],
        "scores": packed[..., 4],
        "labels": packed[..., 5].astype(np.int64),
        "valid": packed[..., 6] > 0.5,
    }


def _scale_packed(packed: np.ndarray, sx: float, sy: float) -> np.ndarray:
    """Scale the box columns of packed detections (..., K, 7) from the
    coarse-input frame to original image coordinates (host-side)."""
    out = np.array(packed, np.float32, copy=True)
    out[..., :4] *= np.array([sx, sy, sx, sy], np.float32)
    return out


def _coarse_row_dets(row7: np.ndarray, sx: float, sy: float) -> dict:
    """One image's coarse detections as a host result dict (the
    ``fuse_global`` fallback when UFP yields no foreground regions)."""
    d = unpack_detections(_scale_packed(row7, sx, sy))
    v = d["valid"]
    return {"boxes": d["boxes"][v], "scores": d["scores"][v],
            "labels": d["labels"][v]}


def _pow2_pad(n: int) -> int:
    """Smallest power of two >= n (bounds the set of compiled batch
    shapes to log2(max_batch)+1 programs per image shape)."""
    b = 1
    while b < n:
        b *= 2
    return b


def _fuse_packed(gdets, boxes, scores, labels, valid,
                 iou_thr: float = 0.65, max_out: int = 500):
    """Global-local fusion of one image's detection sets on device.

    ``gdets``: (Kg, 7) packed coarse (full-image) detections already in
    original coordinates; ``boxes``/``scores``/``labels``/``valid``: the
    unmapped UFP detections.  Reference semantics: concat both sets, one
    class-wise batched NMS (yolox-drone/merge_results.py:153-158).
    """
    gb = gdets[:, :4]
    gs = gdets[:, 4]
    gl = gdets[:, 5].astype(labels.dtype)
    gv = gdets[:, 6] > 0.5
    ab = jnp.concatenate([gb, boxes], axis=0)
    asc = jnp.concatenate([jnp.where(gv, gs, NEG_INF),
                           jnp.where(valid, scores, NEG_INF)], axis=0)
    al = jnp.concatenate([gl, labels], axis=0)
    keep, _ = batched_nms(ab, asc, al, iou_thr)
    kept = jnp.where(keep, asc, NEG_INF)
    out_scores, idx = jax.lax.top_k(kept, max_out)
    out_valid = out_scores > NEG_INF / 2
    return (ab[idx], jnp.where(out_valid, out_scores, 0.0), al[idx],
            out_valid)


@functools.partial(jax.jit, static_argnames=("iou_thr", "max_out"))
def _unmap_and_nms(det_boxes, det_scores, det_labels, det_valid, regions,
                   iou_thr: float = 0.6, max_out: int = 500):
    """Chip unmap + IoF gate + class-wise NMS, fixed shape."""
    boxes, valid = unmap_chip_detections_argmax(
        det_boxes, det_valid, regions)
    scores = jnp.where(valid, det_scores, NEG_INF)
    labels = det_labels
    # offset=1.0: the driver's chip NMS is py_cpu_nms with the legacy
    # +1 pixel-area convention (ufpmp_det_eval.py:149-178, used at :306)
    keep, _ = batched_nms(boxes, scores, labels, iou_thr, offset=1.0)
    kept = jnp.where(keep, scores, NEG_INF)
    out_scores, idx = jax.lax.top_k(kept, max_out)
    out_valid = out_scores > NEG_INF / 2
    return (boxes[idx], jnp.where(out_valid, out_scores, 0.0),
            labels[idx], out_valid)


def _collapse_jobs_to_max_bucket(jobs: Dict[int, list]) -> Dict[int, list]:
    """The ``bucket_policy="chunk-max"`` collapse: all of a chunk's
    mosaic jobs run at the largest needed bucket, so the chunk stays ONE
    pow2-padded group (a dense bucket ladder would otherwise fragment a
    32-image chunk into e.g. 20@1024 + 12@1152 -> padded to 32 + 16
    mosaic slots).  Job tuples are untouched; collection is keyed by the
    original image index, so order within the group is free."""
    if len(jobs) <= 1:
        return jobs
    merged: List[tuple] = []
    for bk in sorted(jobs):
        merged.extend(jobs[bk])
    return {max(jobs): merged}


class _BatchHandle:
    """In-flight batch state for the streaming submit/dispatch/collect
    protocol (one ``run_batch`` split into its three phases so a server
    can overlap several batches against the device)."""

    __slots__ = ("shapes", "chunks", "pending", "fallbacks", "dispatched")

    def __init__(self, shapes, chunks):
        self.shapes = shapes        # per-frame (h0, w0) original sizes
        self.chunks = chunks        # (orig_indices, dev_stack, coarse_fut)
        self.pending = []           # (orig_index, mosaic_future, row slot)
        self.fallbacks = []         # (orig_index, det dict) — no regions
        self.dispatched = False


class TwoStagePipeline:
    """End-to-end UFPMP inference: callable(image) -> detections dict."""

    def __init__(self, coarse_apply, mp_apply, coarse_hw: Tuple[int, int],
                 num_classes: int = 10,
                 ufp_scale: float = 1.5,
                 max_regions: int = 32,
                 mosaic_buckets: Sequence[int] = DEFAULT_BUCKETS,
                 coarse_score_thr: float = 0.3,
                 chip_score_thr: float = 0.01,
                 final_nms_thr: float = 0.6,
                 max_coarse_dets: int = 200,
                 max_chip_dets: int = 500,
                 coarse_vars=None, mp_vars=None,
                 max_batch: int = 4,
                 max_paint_regions: Optional[int] = None,
                 fuse_global: bool = False,
                 fusion_nms_thr: float = 0.65,
                 mosaic_dtype=jnp.bfloat16,
                 painter: str = "auto",
                 paint_table_cap: int = 24,
                 table_build: str = "device",
                 quant8=False,
                 act_scales=None,
                 devices=None,
                 bucket_policy: str = "image",
                 pack_mode: str = "square",
                 scan_width: Optional[int] = None,
                 pack_threads: Optional[int] = None):
        """Two call conventions:

        - coarse_apply(variables, images) with ``coarse_vars`` given
          (preferred — weights stay jit *arguments*; closing over them
          would bake ~30M params into the HLO as literal constants and
          stall XLA constant folding), or
        - coarse_apply(images) already bound, with ``coarse_vars=None``
          (weights become constants — fine only for tiny test models).

        ``quant8``: False | True (dynamic W8A8, ops/quant.py) |
        "static" (calibrated W8A8 with an explicit int8 backbone,
        ops/quant_static.py — the fastest serving mode, 1.30x the MP-Det
        forward on v5e).  "static" needs ``act_scales`` = the
        ``(coarse_scales, mp_scales)`` pair from :meth:`calibrate_int8`
        on a pipeline built WITHOUT quantization over a few sample
        frames.

        ``devices``: optional device list for multi-chip serving —
        request batches round-robin across them (weights are replicated
        per device on first use; the two-stage workload is
        embarrassingly data-parallel, so N chips give ~N× serving
        throughput with no collectives).  Requires ``coarse_vars`` /
        ``mp_vars`` (bound applies bake weights for one device).
        """
        # raw (pre-quantization) applies, kept for calibrate_int8
        self._raw_coarse_apply = coarse_apply
        self._raw_mp_apply = mp_apply
        if quant8 == "static":
            if act_scales is not None:
                from glsdet_tpu.ops.quant_static import \
                    wrap_apply_quant8_static
                coarse_apply = wrap_apply_quant8_static(
                    coarse_apply, act_scales[0])
                mp_apply = wrap_apply_quant8_static(mp_apply,
                                                    act_scales[1])
            # with act_scales=None the pipeline runs full precision and
            # serves as the calibration vehicle (see calibrate_int8)
        elif quant8:
            # W8A8 dynamic-quantized forwards (ops/quant.py): every
            # nn.Conv in both models runs s8xs8->s32 on the MXU.  The
            # wrap must happen before the jitted closures below capture
            # the apply fns so the interceptor is active at trace time.
            from glsdet_tpu.ops.quant import wrap_apply_quant8
            coarse_apply = wrap_apply_quant8(coarse_apply)
            mp_apply = wrap_apply_quant8(mp_apply)
        self.quant8 = quant8
        self.coarse_hw = coarse_hw
        self.num_classes = num_classes
        self.ufp_scale = ufp_scale
        self.max_regions = max_regions
        self.buckets = tuple(mosaic_buckets)
        # host UFP packing pool: per-frame packing is independent and the
        # C++ packer releases the GIL, so a chunk packs in parallel
        # (identical results, order preserved).  None = auto (min(8,
        # cpus)); <=1 disables.
        import os as _os_mod
        if pack_threads is None:
            pack_threads = min(8, _os_mod.cpu_count() or 1)
        self._pack_pool = None
        if pack_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pack_pool = ThreadPoolExecutor(
                max_workers=pack_threads,
                thread_name_prefix="glsdet-ufp-pack")
        if bucket_policy not in ("image", "chunk-max"):
            raise ValueError(f"bucket_policy {bucket_policy!r}: expected "
                             "'image' or 'chunk-max'")
        # "image": smallest covering bucket per image (minimal canvas,
        # but a chunk spanning adjacent buckets splits into several
        # pow2-padded mosaic groups).  "chunk-max": one group per chunk
        # at the largest needed bucket — no padding waste; the right
        # choice for chunked/staged serving with a dense bucket ladder.
        self.bucket_policy = bucket_policy
        if pack_mode not in ("square", "bucket-fit"):
            raise ValueError(f"pack_mode {pack_mode!r}: expected "
                             "'square' or 'bucket-fit'")
        # "square": the reference's width binary search targeting a
        # near-square mosaic, bucketed afterwards (bit-parity layouts).
        # "bucket-fit": pack directly at each ladder width and take the
        # smallest bucket the regions fit — same crops/factors, only
        # placements differ; dense loads drop a whole bucket size
        # (ufp/packing.py pack_regions_fit).
        self.pack_mode = pack_mode
        # scan_width: cap on the per-iteration width of the stage
        # programs.  Chunks wider than this run as a lax.scan over
        # scan_width-wide groups INSIDE one jitted program: one
        # dispatch/readback RPC for the whole chunk (the tunnel's ~30ms
        # per-RPC floor is paid once) while live activation memory stays
        # bounded by one group — b256 as a flat program needs 21G of
        # HBM (>15.75G on v5e) but scans fine at 2x128.
        if scan_width is not None and int(scan_width) < 1:
            raise ValueError(f"scan_width {scan_width!r}: expected a "
                             "positive int or None")
        self.scan_width = int(scan_width) if scan_width else None
        scan_width = self.scan_width
        self.coarse_score_thr = coarse_score_thr
        self.chip_score_thr = chip_score_thr
        self.final_nms_thr = final_nms_thr
        self.max_coarse = max_coarse_dets
        self.max_chip = max_chip_dets
        self._cvars = coarse_vars
        self._mvars = mp_vars
        if devices and (coarse_vars is None or mp_vars is None):
            raise ValueError("devices= needs coarse_vars/mp_vars "
                             "(weights must be replicable per device)")
        self._devices = list(devices) if devices else None
        self._dev_cycle = (itertools.cycle(self._devices)
                           if self._devices else None)
        self._vars_by_dev: Dict[Any, tuple] = {}
        self.max_batch = max(1, int(max_batch))
        # painter rows: tile-splitting can produce more rows than regions
        # (padding rows cost ~nothing — cond-skipped in the flat scan)
        self.max_paint = (max_paint_regions if max_paint_regions
                          else 2 * max_regions)
        # painter backend: the pallas tile-owning kernel is ~4x faster
        # than the XLA scan painter on TPU (VMEM-resident tiles, no HBM
        # RMW); "auto" picks it on TPU backends, the XLA painter
        # elsewhere (pallas interpret mode is too slow for CPU use).
        # GLSDET_PAINTER=pallas|xla overrides.
        import os as _os

        p = _os.environ.get("GLSDET_PAINTER", painter)
        if p == "auto":
            p = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.painter = p
        self.paint_cap = int(paint_table_cap)
        # "device": the pallas painter's tile tables are built inside
        # the stage-2 program from the (b, R, 7) region rows (which the
        # program already receives for unmapping) — no host binning, no
        # table upload.  "host" keeps the C++/python host binner
        # (build_tile_tables) and ships (b, NT, NT, cap, 8) tables.
        self.table_build = _os.environ.get("GLSDET_TABLE_BUILD",
                                           table_build)
        if self.table_build not in ("device", "host"):
            raise ValueError(f"table_build {self.table_build!r}: "
                             "expected 'device' or 'host'")
        # painter="pallas" off-TPU (explicit opt-in only — "auto" never
        # picks it there) runs the kernel in pallas interpret mode so the
        # table-driven paths stay testable on CPU.
        paint_interpret = (self.painter == "pallas"
                           and jax.default_backend() != "tpu")

        def _coarse_preproc(imgs):
            # Resize + normalize run in ``mosaic_dtype`` (bfloat16 by
            # default) — the fp32 chain materializes ~8x the uint8
            # frame bytes before the model even starts.
            dt = mosaic_dtype
            b = imgs.shape[0]
            img = imgs.astype(dt)
            resized = jax.image.resize(
                img, (b, coarse_hw[0], coarse_hw[1], 3), method="bilinear")
            mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
            inv_std = 1.0 / jnp.asarray([58.395, 57.12, 57.375],
                                        jnp.float32)
            return (resized - mean.astype(dt)) * inv_std.astype(dt)

        # model-input capture for int8 calibration (device-resident)
        self._coarse_inputs_j = jax.jit(_coarse_preproc)

        def _scan_groups(fn, parts):
            # Run ``fn(*group)`` over pre-grouped (g, width, ...) parts
            # inside ONE program: a lax.scan bounds live activations to
            # one group while the whole chunk still costs a single
            # dispatch/readback RPC on the tunnel.
            _, out = jax.lax.scan(lambda c, x: (c, fn(*x)), None, parts)
            return out.reshape(out.shape[0] * out.shape[1],
                               *out.shape[2:])

        def _group(x, width):
            return x.reshape(x.shape[0] // width, width, *x.shape[1:])

        def _group_paint(paint, b, width):
            # pallas per-tile tables / per-job region rows are per-job:
            # clean group reshape.  The flat XLA painter payload is
            # (b*P, 8) with the job slot in col 7; slots are contiguous
            # per group, so the in-group slot is slot % width.
            if paint.ndim in (3, 5):
                return _group(paint, width)
            rows_per_group = paint.shape[0] // b * width
            local = paint.at[:, 7].set(jnp.mod(paint[:, 7], width))
            return local.reshape(b // width, rows_per_group,
                                 paint.shape[1])

        def _coarse_packed(variables, imgs):
            images = _coarse_preproc(imgs)
            out = (coarse_apply(variables, images)
                   if variables is not None else coarse_apply(images))
            cls, reg, obj = out
            d = yolox_postprocess(
                cls, reg, obj, coarse_hw, score_thr=coarse_score_thr,
                max_dets=max_coarse_dets)
            return pack_detections(d["boxes"], d["scores"], d["labels"],
                                   d["valid"])

        @jax.jit
        def _coarse_full_batch(variables, imgs):
            # imgs: (B, H, W, 3) uint8 — ONE stacked upload + ONE dispatch
            # for the whole chunk (a tunneled TPU pays per-RPC overhead,
            # so B frames per round trip is ~B-fold fewer stalls), and
            # ONE packed output array (one readback transfer).  Chunks
            # wider than ``scan_width`` scan over groups (see ctor).
            b = imgs.shape[0]
            if scan_width and b > scan_width and b % scan_width == 0:
                return _scan_groups(
                    lambda im: _coarse_packed(variables, im),
                    (_group(imgs, scan_width),))
            return _coarse_packed(variables, imgs)

        self._coarse_full_batch = (
            lambda imgs: _coarse_full_batch(self._vars_for(imgs)[0],
                                            imgs))

        _unmap_nms_v = jax.vmap(functools.partial(
            _unmap_and_nms, iou_thr=final_nms_thr, max_out=max_chip_dets))

        def _normalize_canvas(canv):
            # The canvas + normalize chain runs in ``mosaic_dtype``
            # (default bfloat16): at b32/1280^2 the fp32 version moves
            # ~1.9GB of HBM traffic per batch through the painter RMW,
            # the normalize round-trip and the first conv's read —
            # bfloat16 halves it for a <=0.5/255 pixel error.
            dt = mosaic_dtype
            mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
            inv_std = 1.0 / jnp.asarray([58.395, 57.12, 57.375],
                                        jnp.float32)
            return (canv - mean.astype(dt)) * inv_std.astype(dt)

        def _stage2_rest(variables, canv, regions, hw):
            # normalize -> MP-Det forward -> decode+NMS -> unmap+NMS.
            mosaics = _normalize_canvas(canv)
            out = (mp_apply(variables, mosaics)
                   if variables is not None else mp_apply(mosaics))
            cls, reg = out
            mp_dets = gfl_postprocess(
                cls, reg, (hw, hw), score_thr=chip_score_thr,
                max_dets=max_chip_dets)
            return _unmap_nms_v(
                mp_dets["boxes"], mp_dets["scores"], mp_dets["labels"],
                mp_dets["valid"], regions)

        def _canvas(imgs, idx, paint, hw):
            # imgs: (B, H, W, 3) uint8 stacked chunk already on device;
            # idx: (b,) int32 rows of the chunk to assemble; paint:
            # (b*P, 8) flat tile-split painter rows (8th col = slot in
            # ``idx``) — XLA scan painter — OR (b, NT, NT, K, 8) int32
            # per-tile tables for the pallas painter — OR (b, R, 7)
            # UNSPLIT region rows (= the unmap ``regions`` array; the
            # tile tables are then built on device, so the host never
            # bins and never uploads tables).  Painting happens at the
            # tile-aligned ``paint_hw_for(hw)`` canvas and crops back
            # to the (model) bucket — see paint_hw_for.
            sel = imgs[idx]
            ph = paint_hw_for(hw)
            if paint.ndim == 3:
                tables = jax.vmap(functools.partial(
                    build_tile_tables_jax, out_h=ph, out_w=ph,
                    tile=paint_tile(hw), cap=self.paint_cap))(paint)
                canv = assemble_mosaic_pallas_batch(
                    sel, tables, ph, ph, tile=paint_tile(hw),
                    dtype=mosaic_dtype, interpret=paint_interpret)
            elif paint.ndim == 5:
                canv = assemble_mosaic_pallas_batch(
                    sel, paint, ph, ph, tile=paint_tile(hw),
                    dtype=mosaic_dtype, interpret=paint_interpret)
            else:
                canv = assemble_mosaic_tiled_batch(
                    sel, paint, ph, ph, tile=paint_tile(hw),
                    dtype=mosaic_dtype)
            if ph != hw:
                canv = canv[:, :hw, :hw, :]
            return canv

        @functools.partial(jax.jit, static_argnames=("hw",))
        def _mosaic_inputs(imgs, idx, paint, hw):
            # normalized mosaics = the MP-Det model inputs, for int8
            # calibration (device-resident, never read back)
            return _normalize_canvas(_canvas(imgs, idx, paint, hw))

        self._mosaic_inputs_j = _mosaic_inputs

        def _stage2_core(variables, imgs, idx, paint, regions, hw):
            # regions: (b, R, 7) original rows for unmapping.  One
            # dispatch covers assembly, MP-Det forward, decode+NMS and
            # unmapping for the group; ONE packed output array.
            canv = _canvas(imgs, idx, paint, hw)
            return _stage2_rest(variables, canv, regions, hw)

        def _stage2_packed(variables, imgs, idx, paint, regions, hw):
            ob, osc, ol, ov = _stage2_core(variables, imgs, idx, paint,
                                           regions, hw)
            return pack_detections(ob, osc, ol, ov)

        def _stage2_scannable(paint, b):
            return (scan_width and b > scan_width
                    and b % scan_width == 0
                    and (paint.ndim in (3, 5)
                         or paint.shape[0] % b == 0))

        @functools.partial(jax.jit, static_argnames=("hw",))
        def _mosaic_stage_batch(variables, imgs, idx, paint, regions, hw):
            b = idx.shape[0]
            if _stage2_scannable(paint, b):
                return _scan_groups(
                    lambda i, p, r: _stage2_packed(variables, imgs, i, p,
                                                   r, hw),
                    (_group(idx, scan_width),
                     _group_paint(paint, b, scan_width),
                     _group(regions, scan_width)))
            return _stage2_packed(variables, imgs, idx, paint, regions,
                                  hw)

        self._mosaic_stage_batch = (
            lambda imgs, idx, paint, regions, hw: _mosaic_stage_batch(
                self._vars_for(imgs)[1], imgs, idx, paint, regions, hw))
        # raw jit handles for AOT lowering (cost_analysis): the bound
        # lambdas above cannot be .lower()ed
        self._coarse_jit = _coarse_full_batch
        self._stage2_jit = _mosaic_stage_batch

        # Integrated global-local fusion: the stage-1 detections are
        # already in hand when stage 2 is dispatched, so the fusion NMS
        # (merge_results.py semantics) runs inside the same program —
        # no second coarse forward and no extra dispatch/readback
        # (the reference and the earlier CLI both re-ran the coarse
        # model on the full image for the "global" set).
        self.fuse_global = bool(fuse_global)
        self.fusion_nms_thr = fusion_nms_thr
        _fuse_v = jax.vmap(functools.partial(
            _fuse_packed, iou_thr=fusion_nms_thr, max_out=max_chip_dets))

        def _stage2_packed_fused(variables, imgs, idx, paint, regions,
                                 gdets, hw):
            ob, osc, ol, ov = _stage2_core(variables, imgs, idx, paint,
                                           regions, hw)
            fb, fs, fl, fv = _fuse_v(gdets, ob, osc, ol, ov)
            return pack_detections(fb, fs, fl, fv)

        @functools.partial(jax.jit, static_argnames=("hw",))
        def _mosaic_stage_batch_fused(variables, imgs, idx, paint,
                                      regions, gdets, hw):
            # gdets: (b, Kg, 7) packed coarse detections in ORIGINAL
            # image coordinates (host scales them from the coarse-input
            # frame before upload — a few KB).
            b = idx.shape[0]
            if _stage2_scannable(paint, b):
                return _scan_groups(
                    lambda i, p, r, g: _stage2_packed_fused(
                        variables, imgs, i, p, r, g, hw),
                    (_group(idx, scan_width),
                     _group_paint(paint, b, scan_width),
                     _group(regions, scan_width),
                     _group(gdets, scan_width)))
            return _stage2_packed_fused(variables, imgs, idx, paint,
                                        regions, gdets, hw)

        self._mosaic_stage_batch_fused = (
            lambda imgs, idx, paint, regions, gdets, hw:
            _mosaic_stage_batch_fused(
                self._vars_for(imgs)[1], imgs, idx, paint, regions,
                gdets, hw))

    def _vars_for(self, imgs):
        """(coarse_vars, mp_vars) for the device ``imgs`` lives on —
        replicated lazily per device in multi-chip serving mode."""
        if self._devices is None:
            return self._cvars, self._mvars
        d = next(iter(imgs.devices()))
        pair = self._vars_by_dev.get(d)
        if pair is None:
            pair = (jax.device_put(self._cvars, d),
                    jax.device_put(self._mvars, d))
            self._vars_by_dev[d] = pair
        return pair

    def __call__(self, image: np.ndarray) -> dict:
        """image: (H, W, 3) uint8/float RGB in original resolution.

        Returns dict(boxes xyxy, scores, labels) in original coordinates
        (numpy).  Single-image convenience over ``run_batch``."""
        return self.run_batch([image])[0]

    @staticmethod
    def _flat_paint(job_paints: Sequence[np.ndarray]) -> np.ndarray:
        """Stack per-slot (max_paint, 7) painter rows into the flat
        (b*max_paint, 8) form with the slot index as the 8th column."""
        rows = []
        for s, p in enumerate(job_paints):
            rows.append(np.concatenate(
                [p, np.full((p.shape[0], 1), s, np.float32)], axis=1))
        return np.concatenate(rows, axis=0)

    def calibrate_int8(self, images: Sequence[np.ndarray],
                       min_channels: int = 32):
        """Collect static-int8 activation scales for both models by
        driving ``run_batch`` over sample frames while capturing the
        actual model inputs (normalized coarse frames / painted
        mosaics) at the stage-program boundaries — device-resident, no
        big readbacks.  Returns ``(coarse_scales, mp_scales)`` for
        ``TwoStagePipeline(..., quant8="static", act_scales=...)``.

        Run this on a pipeline built WITHOUT quantization.  Keep the
        sample small (each distinct chunk/bucket shape costs one extra
        jit compile of the capture program).
        """
        from glsdet_tpu.ops.quant_static import calibrate_scales

        if self._cvars is None or self._mvars is None:
            raise ValueError("int8 calibration needs coarse_vars/mp_vars "
                             "(bound applies bake weights as constants)")
        coarse_in, mosaic_in = [], []
        orig = (self._coarse_full_batch, self._mosaic_stage_batch,
                self._mosaic_stage_batch_fused)

        def rec_c(imgs):
            coarse_in.append(self._coarse_inputs_j(imgs))
            return orig[0](imgs)

        def rec_m(imgs, idx, paint, regions, hw):
            mosaic_in.append(self._mosaic_inputs_j(imgs, idx, paint, hw))
            return orig[1](imgs, idx, paint, regions, hw)

        def rec_f(imgs, idx, paint, regions, gdets, hw):
            mosaic_in.append(self._mosaic_inputs_j(imgs, idx, paint, hw))
            return orig[2](imgs, idx, paint, regions, gdets, hw)

        self._coarse_full_batch = rec_c
        self._mosaic_stage_batch = rec_m
        self._mosaic_stage_batch_fused = rec_f
        try:
            self.run_batch(list(images))
        finally:
            (self._coarse_full_batch, self._mosaic_stage_batch,
             self._mosaic_stage_batch_fused) = orig
        cs = calibrate_scales(self._raw_coarse_apply, self._cvars,
                              coarse_in, min_channels=min_channels)
        ms = calibrate_scales(self._raw_mp_apply, self._mvars,
                              mosaic_in, min_channels=min_channels)
        return cs, ms

    def _paint_group(self, unmap_list: Sequence[np.ndarray],
                     bucket: int) -> np.ndarray:
        """Painter payload for one mosaic group: (b, NT, NT, cap, 8)
        int32 per-tile tables (pallas kernel) or (b*P, 8) float32 flat
        split rows (XLA scan painter).  The stage-2 program dispatches
        on the payload rank.  Tables are built at the tile-aligned
        ``paint_hw_for(bucket)`` paint canvas (every bucket paints with
        the pallas kernel; the canvas is cropped to the bucket before
        the model).  Falls back to the XLA painter only when an image
        overflows the per-tile entry cap (pathologically dense
        packings)."""
        t = paint_tile(bucket)
        ph = paint_hw_for(bucket)
        if self.painter == "pallas":
            if self.table_build == "device":
                # cheap vectorized cap check only — the tables
                # themselves are built inside the stage-2 program from
                # the (b, R, 7) rows (build_tile_tables_jax), which the
                # dispatcher ships anyway for unmapping
                if all(tile_max_count(u, ph, ph, t) <= self.paint_cap
                       for u in unmap_list):
                    return np.stack(unmap_list)
            else:
                # per-job table builds are independent (C++ binner, GIL
                # released) — build the group across the pack pool
                build = functools.partial(build_tile_tables, out_h=ph,
                                          out_w=ph, tile=t,
                                          cap=self.paint_cap)
                results = (list(self._pack_pool.map(build, unmap_list))
                           if self._pack_pool is not None
                           else [build(u) for u in unmap_list])
                if not any(ovf for _, ovf in results):
                    return np.stack([tb for tb, _ in results])
        return self._flat_paint(
            [split_rows_for_tile(u, t, self.max_paint)
             for u in unmap_list])

    def run_batch(self, images: Sequence[np.ndarray]) -> List[dict]:
        """Pipelined, chunk-batched inference.

        Frames are grouped by shape into chunks of up to ``max_batch``;
        each chunk is ONE stacked uint8 upload + ONE coarse dispatch, and
        its mosaic jobs (grouped by canvas bucket) are ONE mosaic-stage
        dispatch each — on a tunneled TPU this divides the per-RPC
        round-trip overhead by the chunk size.  Chunks are padded up to a
        power of two by repeating the last frame so at most
        log2(max_batch)+1 program shapes ever compile per image shape.

        JAX dispatch stays asynchronous: every coarse chunk is enqueued
        before any result is read, so host-side UFP packing overlaps
        device compute (the reference's packing blocks its GPU,
        ufpmp_det_eval.py:263).

        Composition of the streaming protocol — a server holding several
        requests in flight should instead call :meth:`submit_batch` /
        :meth:`dispatch_mosaics` / :meth:`collect_batch` directly so
        batch N+1's coarse programs run on-device while batch N is being
        packed and its mosaics read back (see ``serve.AsyncDetector``).
        """
        h = self.submit_batch(images)
        self.dispatch_mosaics(h)
        return self.collect_batch(h)

    def submit_batch(self, images: Sequence[np.ndarray]):
        """Streaming phase 1: upload shape-grouped chunks and enqueue
        their coarse programs.  Returns an opaque batch handle; nothing
        blocks on device results here (JAX dispatch is asynchronous).
        In multi-chip mode (``devices=``) the whole batch lands on the
        next device in the round-robin cycle."""
        target = next(self._dev_cycle) if self._dev_cycle else None

        # shape-grouped chunks -> stacked upload + coarse batch
        by_shape: Dict[tuple, List[int]] = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape, []).append(i)

        chunks = []  # (orig_indices, dev_stack, coarse_future)
        for idxs in by_shape.values():
            for s in range(0, len(idxs), self.max_batch):
                part = idxs[s:s + self.max_batch]
                b = _pow2_pad(len(part))
                padded = part + [part[-1]] * (b - len(part))
                stack = np.stack([np.asarray(images[i], np.uint8)
                                  for i in padded])
                dev = (jax.device_put(stack, target) if target is not None
                       else jnp.asarray(stack))    # one upload per chunk
                fut = self._coarse_full_batch(dev)
                _prefetch(fut)   # readback wire time overlaps other work
                chunks.append((part, dev, fut))
        return _BatchHandle(shapes=[im.shape[:2] for im in images],
                            chunks=chunks)

    def submit_device_batch(self, dev_stack):
        """Streaming phase 1 for a device-resident uint8 (B, H, W, 3)
        stack (HBM-staged ingest): ONE coarse dispatch, no upload.
        Returns a batch handle for :meth:`dispatch_mosaics` /
        :meth:`collect_batch`."""
        b, h0, w0 = (int(dev_stack.shape[0]), int(dev_stack.shape[1]),
                     int(dev_stack.shape[2]))
        fut = self._coarse_full_batch(dev_stack)
        _prefetch(fut)
        chunk = (list(range(b)), dev_stack, fut)
        return _BatchHandle(shapes=[(h0, w0)] * b, chunks=[chunk])

    def dispatch_mosaics(self, h: "_BatchHandle"):
        """Streaming phase 2: read the handle's coarse detections (one
        packed array per chunk), run UFP packing on host, and enqueue the
        mosaic-stage programs.  Blocks only on the coarse results; the
        mosaic programs are left in flight on the handle."""
        ch, cw = self.coarse_hw
        shapes, chunks = h.shapes, h.chunks
        n = len(shapes)

        # read coarse dets, pack on host, group mosaic jobs by bucket
        # within each chunk (jobs reuse the chunk's device stack)
        mid: List[Optional[tuple]] = [None] * n
        pending = h.pending   # (orig_index, future, row)
        fallbacks = h.fallbacks  # (orig_index, det dict) — no regions
        for part, dev, packed in chunks:
            # multi-chip mode: mosaic-stage args follow the chunk's
            # device (mixed-device jit args are an error)
            target = (next(iter(dev.devices()))
                      if self._devices is not None else None)
            _put = (jnp.asarray if target is None
                    else functools.partial(jax.device_put,
                                           device=target))
            packed_np = np.asarray(packed)     # ONE readback transfer
            dets = unpack_detections(packed_np)
            all_boxes = dets["boxes"]
            all_valid = dets["valid"]

            def _pack_one(row_i):
                # per-frame UFP packing is independent and the C++
                # packer releases the GIL (ctypes FFI), so the chunk
                # packs across the host pool — dense loads (~150
                # regions/frame) cost ~6.6 ms/img single-threaded,
                # which would cap the pipelined steady state below the
                # device programs' ~4.6 ms/img
                row, i = row_i
                h0, w0 = shapes[i]
                sx, sy = w0 / cw, h0 / ch
                coarse_boxes = (all_boxes[row]
                                * np.array([sx, sy, sx, sy],
                                           np.float32))[all_valid[row]]
                if self.pack_mode == "bucket-fit":
                    return unified_foreground_packing_rows_fit(
                        coarse_boxes, self.ufp_scale, (w0, h0),
                        self.max_regions, self.buckets)
                return unified_foreground_packing_rows(
                    coarse_boxes, self.ufp_scale, (w0, h0),
                    self.max_regions) + (None,)

            items = list(enumerate(part))
            pool = self._pack_pool
            packs = (list(pool.map(_pack_one, items)) if pool is not None
                     else [_pack_one(it) for it in items])

            jobs: Dict[int, List[tuple]] = {}
            for (row, i), (unmap_rows, n_reg, mw, mh,
                           fit_bucket) in zip(items, packs):
                if n_reg == 0:
                    if self.fuse_global:
                        h0, w0 = shapes[i]
                        fallbacks.append((i, _coarse_row_dets(
                            packed_np[row], w0 / cw, h0 / ch)))
                    continue
                bucket = (fit_bucket if fit_bucket is not None
                          else pick_bucket(mh, mw, self.buckets))
                jobs.setdefault(bucket, []).append(
                    (i, row, unmap_rows))
            if self.bucket_policy == "chunk-max":
                jobs = _collapse_jobs_to_max_bucket(jobs)
            for bucket, job_list in jobs.items():
                b = _pow2_pad(len(job_list))
                job_list = job_list + [job_list[-1]] * (b - len(job_list))
                rows_np = np.array([j[1] for j in job_list], np.int32)
                rows = _put(rows_np)
                paint_np = self._paint_group(
                    [j[2] for j in job_list], bucket)
                paints = _put(paint_np)
                # device-built tables: the paint payload IS the unmap
                # rows array — ship it once, bind it to both args
                regs = (paints if paint_np.ndim == 3
                        else _put(np.stack([j[2] for j in job_list])))
                if self.fuse_global:
                    h0, w0 = shapes[part[0]]
                    g = _scale_packed(packed_np[rows_np], w0 / cw, h0 / ch)
                    fut = self._mosaic_stage_batch_fused(
                        dev, rows, paints, regs, _put(g), bucket)
                else:
                    fut = self._mosaic_stage_batch(dev, rows, paints,
                                                   regs, bucket)
                _prefetch(fut)
                for slot, job in enumerate(job_list):
                    i = job[0]
                    if mid[i] is None:   # skip pow2-padding repeats
                        pending.append((i, fut, slot))
                        mid[i] = ()
        h.dispatched = True

    def collect_batch(self, h: "_BatchHandle") -> List[dict]:
        """Streaming phase 3: read the handle's mosaic-stage results
        (one transfer per future) and assemble per-image detections."""
        if not h.dispatched:
            self.dispatch_mosaics(h)
        n = len(h.shapes)
        empty = {
            "boxes": np.zeros((0, 4), np.float32),
            "scores": np.zeros((0,), np.float32),
            "labels": np.zeros((0,), np.int64),
        }
        results: List[dict] = [empty] * n
        for i, det in h.fallbacks:
            results[i] = det
        for _, fut, _ in h.pending:   # all wire transfers in flight
            _prefetch(fut)            # before the first blocking read
        fetched: Dict[int, dict] = {}
        for i, fut, slot in h.pending:
            if id(fut) not in fetched:
                fetched[id(fut)] = unpack_detections(fut)
            d = fetched[id(fut)]
            fv_i = d["valid"][slot]
            results[i] = {
                "boxes": d["boxes"][slot][fv_i],
                "scores": d["scores"][slot][fv_i],
                "labels": d["labels"][slot][fv_i],
            }
        return results

    def run_device_batch(self, dev_stack) -> List[dict]:
        """Inference on a device-resident uint8 stack (B, H, W, 3).

        The staged twin of ``run_batch`` for ingest paths that already
        land frames in HBM (camera DMA, a decode stage, a sharded
        loader): no host->device transfer happens here — one coarse
        dispatch on the stack, host packing from the (small, single
        packed-array) detection readback, one mosaic dispatch per
        bucket.  Frames must share one shape by construction.  For
        several stacks, prefer ``run_device_batches`` which pipelines
        readbacks/packing against device compute across stacks.
        """
        return self.run_device_batches([dev_stack])[0]

    def run_device_batches(self, stacks: Sequence) -> List[List[dict]]:
        """Pipelined inference over several device-resident stacks.

        All coarse programs are enqueued before any result is read, and
        each stack's mosaic jobs are enqueued as soon as its packing is
        done — so coarse-detection readbacks (one RPC each) and host
        packing overlap device execution of the other stacks' programs.
        This is the multi-stream server shape: per-batch dispatch/readback
        latency hides behind compute instead of adding to it.

        Composition of the streaming protocol: every stack's coarse
        program is enqueued (``submit_device_batch``) before any
        packing (``dispatch_mosaics``) runs, and every mosaic program is
        in flight before any result is read (``collect_batch``).
        """
        handles = [self.submit_device_batch(s) for s in stacks]
        for h in handles:
            self.dispatch_mosaics(h)
        return [self.collect_batch(h) for h in handles]

    def warmup(self, image_hw: Tuple[int, int]):
        """Compile the coarse + mosaic programs for every bucket at the
        batch sizes the chunked ``run_batch`` will hit (1 and the pow2 of
        ``max_batch``) — on every serving device in multi-chip mode."""
        img = np.zeros((*image_hw, 3), np.uint8)
        reg1 = regions_to_array([], self.max_regions)
        for target in (self._devices or [None]):
            _put = (jnp.asarray if target is None
                    else functools.partial(jax.device_put,
                                           device=target))
            for b in sorted({1, _pow2_pad(self.max_batch)}):
                dev = _put(np.stack([img] * b))
                jax.block_until_ready(self._coarse_full_batch(dev))
                rows = _put(np.zeros((b,), np.int32))
                regs = _put(np.stack([reg1] * b))
                for bk in self.buckets:
                    paints = _put(self._paint_group([reg1] * b, bk))
                    if self.fuse_global:
                        g = _put(np.zeros((b, self.max_coarse, 7),
                                          np.float32))
                        jax.block_until_ready(
                            self._mosaic_stage_batch_fused(
                                dev, rows, paints, regs, g, bk))
                    else:
                        jax.block_until_ready(self._mosaic_stage_batch(
                            dev, rows, paints, regs, bk))

    def cost_analysis(self, image_hw: Tuple[int, int],
                      bucket: Optional[int] = None,
                      batch: Optional[int] = None) -> dict:
        """Per-image XLA cost_analysis of the two stage programs.

        Lowers + AOT-compiles the coarse and mosaic-stage programs at
        the shapes ``run_batch`` uses (hits the persistent compile cache
        when :meth:`warmup` already built them) and reports flops and
        HBM bytes accessed per image — the inputs of a roofline bound.
        Returns {"coarse": {flops, bytes}, "stage2": {flops, bytes}}
        (per image; NaN fields when the backend reports no analysis).
        """
        b = _pow2_pad(batch or self.max_batch)
        # a scanned chunk (b > scan_width) lowers to a loop whose body
        # XLA cost_analysis counts ONCE (not x length), which would
        # undercount per-image cost by the group count; the per-image
        # cost of the flat scan_width-wide program is identical, so
        # analyze that instead.
        if self.scan_width and b > self.scan_width:
            b = self.scan_width
        bk = bucket or self.buckets[0]
        img = np.zeros((*image_hw, 3), np.uint8)
        dev = jnp.asarray(np.stack([img] * b))
        reg1 = regions_to_array([], self.max_regions)
        rows = jnp.asarray(np.zeros((b,), np.int32))
        regs = jnp.asarray(np.stack([reg1] * b))
        paints = jnp.asarray(self._paint_group([reg1] * b, bk))
        cvars, mvars = self._vars_for(dev)

        def _per_image(lowered):
            compiled = lowered.compile()
            ca = compiled.cost_analysis() or {}
            out = {
                "flops": float(ca.get("flops", float("nan"))) / b,
                "bytes": float(ca.get("bytes accessed",
                                      float("nan"))) / b,
            }
            # fusion-level HBM traffic (scripts/hlo_traffic.py): the
            # cost model bills intra-fusion values as HBM and
            # overcounts — entry-dataflow bytes are what a bandwidth
            # roofline can stand on (same methodology as the train
            # bench, ARCHITECTURE §9 round-4)
            try:
                import os as _os
                import sys as _sys

                _scripts = _os.path.join(_os.path.dirname(_os.path.dirname(
                    _os.path.dirname(_os.path.abspath(__file__)))),
                    "scripts")
                if _scripts not in _sys.path:
                    _sys.path.append(_scripts)
                from hlo_traffic import (compiled_flops_by_dtype,
                                         compiled_traffic)

                out["bytes_traffic"] = (
                    float(compiled_traffic(compiled)["bytes"]) / b)
                # dtype split of the MXU work: the s8 share should be
                # charged at the chip's int8 peak (~2x bf16 on v5e),
                # not the bf16 peak — VERDICT r04's int8-peak
                # conservatism.  Only the RATIO is used downstream
                # (post-layout halo padding inflates absolute HLO
                # flop counts symmetrically across dtypes).
                by_dtype = compiled_flops_by_dtype(compiled)
                tot = sum(by_dtype.values())
                if tot:
                    s8 = sum(v for k, v in by_dtype.items()
                             if k.startswith("s8"))
                    out["int8_flop_frac"] = s8 / tot
            except Exception:
                pass
            return out

        out = {"batch": b, "bucket": bk}
        out["coarse"] = _per_image(self._coarse_jit.lower(cvars, dev))
        out["stage2"] = _per_image(self._stage2_jit.lower(
            mvars, dev, rows, paints, regs, bk))
        return out
