"""Multi-domain evaluation driver (main.py:876-913 + metrics.py).

Per domain: stream images, run the jitted eval forward, accumulate the 19x19
confusion matrix ON DEVICE (the reference copies full-res logits to host
twice per image, main.py:898-906 — SURVEY.md §3.3 flags it; here only the
final histogram crosses to host). Images whose label size differs from the
image are dropped and counted, exactly like main.py:894,910-911 (a
``strict_pairs=False`` escape hatch keeps them instead).

Eval shape protocol: by default every image runs at its EXACT native shape,
like the reference (main.py:896) — one compile per distinct shape, a handful
per domain (Cityscapes/BDD/SYNTHIA are single-shape). Passing ``bucket=N``
instead pads images up to a bucket grid so a few compiled programs cover
mixed-shape sweeps (Mapillary): padded pixels carry label 255 (never touch
the histogram) and the model's ASPP image pooling is masked to the valid
region (``valid_hw``) — but conv receptive fields near the padded border
still see pad garbage instead of a true image edge, so bucketed logits are
NOT bit-identical to the reference protocol. Use buckets for quick sweeps,
exact shapes (or SlidingEvaluator) for parity numbers.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrfp_tpu.ops.hist import confusion_matrix_update
from mrfp_tpu.ops.pallas_hist import confusion_matrix_pallas


def pad_to_bucket(img: np.ndarray, lbl: np.ndarray, bucket: int = 128,
                  ignore_index: int = 255):
    """Pad HWC image + HW label up to the next bucket multiple (bottom/right)."""
    h, w = lbl.shape
    bh = int(math.ceil(h / bucket)) * bucket
    bw = int(math.ceil(w / bucket)) * bucket
    if (bh, bw) == (h, w):
        return img, lbl
    pimg = np.zeros((bh, bw, img.shape[-1]), img.dtype)
    pimg[:h, :w] = img
    plbl = np.full((bh, bw), ignore_index, lbl.dtype)
    plbl[:h, :w] = lbl
    return pimg, plbl


def _prefetch_put(pairs, size: int = 2):
    """Device-put (image, label) pairs ``size`` ahead of consumption, with
    the batch dim added host-side (an eager device-side reshape would cost
    a dispatch). Transfers enqueue asynchronously, so the next image crosses
    host->device while the current forward executes."""
    buf = []
    for img, lbl in pairs:
        buf.append((jax.device_put(img[None]), jax.device_put(lbl[None])))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


def merge_shard_hists(hist_np: np.ndarray, shard_count: int) -> np.ndarray:
    """Sum per-process partial confusion matrices.

    Cross-process merge uses an all-gather (every process gets the full
    histogram, so every rank logs/returns identical metrics — matching the
    single-process protocol bit-for-bit since hist addition is integer).
    With one process (e.g. a single-host test driving shards sequentially),
    the caller sums partials itself.
    """
    if shard_count <= 1 or jax.process_count() <= 1:
        return hist_np
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(hist_np)
    return np.sum(np.asarray(gathered), axis=0).astype(np.int64)


class SegEvaluator:
    """Streaming per-domain mIoU evaluator."""

    def __init__(self, model, params, batch_stats, num_classes: int = 19,
                 bucket: Optional[int] = None, strict_pairs: bool = True,
                 mesh=None, eval_batch: int = 1):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.num_classes = num_classes
        self.bucket = bucket
        self.strict_pairs = strict_pairs
        # eval_batch > 1: group same-shape images into one forward. EXACT —
        # eval-mode BN reads running stats (no cross-image coupling), so the
        # per-image logits are identical to batch-1; the histogram sum is
        # integer and order-free. The final partial group of each shape is
        # padded with all-ignore dummies (label=255 never touches the hist),
        # keeping ONE compiled program per distinct shape. Amortizes the
        # ~1-2 ms per-dispatch tunnel cost on single-shape domains
        # (Mapillary always 1536^2, Cityscapes/BDD single-native-shape).
        # Exact-shape protocol only: bucket mode needs per-image valid_hw.
        self.eval_batch = max(1, int(eval_batch))
        # multi-chip eval: one full-res image sharded over the mesh 'spatial'
        # axis (batch-1 serving; GSPMD conv halos). Pure-DP meshes add
        # nothing at batch 1, so only a >1-device mesh changes the path.
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        # params flow as jit arguments (a closure would bake them into the
        # executable as constants — one compile per evaluator, no donation)
        if self.mesh is not None:
            from mrfp_tpu.core.mesh import replicated, spatial_sharding
            from mrfp_tpu.ops.resize import pallas_kernels_disabled

            def no_pallas(f):
                def g(*args):
                    with pallas_kernels_disabled():
                        return f(*args)
                return g

            repl = replicated(self.mesh)
            img_s = spatial_sharding(self.mesh, 4)
            lbl_s = spatial_sharding(self.mesh, 3)
            self._step = jax.jit(
                no_pallas(self._hist_step),
                in_shardings=(repl, repl, img_s, lbl_s), out_shardings=repl)
            self._step_masked = jax.jit(
                no_pallas(self._hist_step_masked),
                in_shardings=(repl, repl, img_s, lbl_s, repl),
                out_shardings=repl)
        else:
            self._step = jax.jit(self._hist_step)
            self._step_masked = jax.jit(self._hist_step_masked)

    def _hist_update(self, hist, pred, label):
        if self.mesh is None and jax.default_backend() == "tpu":
            # one-hot MXU matmuls: ~5x faster than the scatter on full-res
            # images (ops/pallas_hist.py); GSPMD cannot partition pallas_call,
            # so meshed eval takes the shardable scatter/one-hot form
            return hist + confusion_matrix_pallas(pred, label, self.num_classes)
        return confusion_matrix_update(hist, pred, label, self.num_classes)

    def _hist_step(self, variables, hist, image, label):
        # uint8 wire format: cast on device (see train/step.py)
        out = self.model.apply(variables, image.astype(jnp.float32),
                               train=False, mutable=False)
        pred = jnp.argmax(out["logits"], axis=-1)
        return self._hist_update(hist, pred, label.astype(jnp.int32))

    def _hist_step_masked(self, variables, hist, image, label, valid_hw):
        out = self.model.apply(variables, image.astype(jnp.float32),
                               train=False, mutable=False, valid_hw=valid_hw)
        pred = jnp.argmax(out["logits"], axis=-1)
        return self._hist_update(hist, pred, label.astype(jnp.int32))

    def run(self, dataset, max_images: Optional[int] = None,
            log=print, shard_rank: int = 0,
            shard_count: int = 1, heartbeat=None) -> Dict[str, object]:
        """Evaluate ``dataset``; with ``shard_count`` > 1, this process scores
        only images ``i % shard_count == shard_rank`` and the partial
        histograms are summed across processes before the metric — the
        multi-host split of the reference's eval loop (main.py:876-913),
        which every DDP rank would otherwise duplicate in full.

        ``heartbeat``: called every few images after a forced device sync
        (a scalar fetch — block_until_ready does not sync on axon). Lets a
        step watchdog distinguish a long mixed-shape validation (one ~5-min
        tunnel compile per distinct shape) from a wedged device; without it
        the watchdog would kill a healthy run mid-validation and a
        supervisor would relaunch into the same validation forever."""
        hist = jnp.zeros((self.num_classes, self.num_classes), jnp.int32)
        dropped = 0
        scored = 0
        synced_at = 0
        n = len(dataset) if max_images is None else min(len(dataset), max_images)
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        # batching applies to the exact-shape protocol only (the masked
        # bucket forward takes one valid_hw for the whole batch)
        eb = self.eval_batch if self.bucket is None else 1
        pending: Dict[tuple, list] = {}
        pad_total = 0  # dummy slots spent padding partial groups
        shapes_seen = set()

        def _sync_heartbeat():
            nonlocal synced_at
            if heartbeat is not None and scored - synced_at >= 4:
                jax.device_get(hist)  # sync: dispatches so far really ran
                heartbeat()
                synced_at = scored

        def _put_group(items):
            nonlocal pad_total
            real = len(items)
            pad_total += eb - real
            if real < eb:
                # pad the final partial group to the compiled batch size with
                # all-ignore dummies (one program per shape, exact hist)
                pad = (np.zeros_like(items[0][0]), np.full_like(items[0][1], 255))
                items = items + [pad] * (eb - real)
            # stack host-side and device_put eagerly: with a 2-deep buffer
            # the next group's transfer overlaps the current forward, same
            # double-buffering the single-image path gets from _prefetch_put
            return (jax.device_put(np.stack([im for im, _ in items])),
                    jax.device_put(np.stack([lb for _, lb in items])), real)

        def _host_samples():
            nonlocal dropped
            for i in range(shard_rank, n, max(1, shard_count)):
                sample = dataset[i]
                # uint8 wire format (ToArray): integer samples ship as-is —
                # 4x fewer host->device bytes — and the jitted step casts
                img = np.asarray(sample["image"])
                if img.dtype != np.uint8:
                    img = img.astype(np.float32)
                lbl = np.asarray(sample["label"])
                if lbl.dtype != np.uint8:
                    lbl = lbl.astype(np.int32)
                if img.shape[:2] != lbl.shape:
                    if self.strict_pairs:
                        dropped += 1  # reference: count+skip (main.py:910-911)
                        continue
                    h = min(img.shape[0], lbl.shape[0])
                    w = min(img.shape[1], lbl.shape[1])
                    img, lbl = img[:h, :w], lbl[:h, :w]
                yield img, lbl

        samples = _host_samples()
        # double-buffer the single-image exact-shape sweep: device_put
        # sample i+1 while the step on sample i executes, overlapping
        # host->device transfer with compute (a full-res uint8 image is
        # still ~6 MB; on thin links the wire IS the eval bottleneck).
        # Grouped/bucketed paths stack host-side and meshed eval commits
        # shardings in the jit, so only this path prefetches.
        prefetched = self.bucket is None and eb == 1 and self.mesh is None
        if prefetched:
            samples = _prefetch_put(samples)
        if self.bucket is None and eb > 1:
            def _groups():
                for img, lbl in samples:
                    shapes_seen.add(lbl.shape)
                    pending.setdefault(lbl.shape, []).append((img, lbl))
                    if len(pending[lbl.shape]) == eb:
                        yield pending.pop(lbl.shape)
                for items in pending.values():  # final partial groups
                    yield items

            buf = []
            for group in _groups():
                buf.append(_put_group(group))
                if len(buf) >= 2:
                    image, label, real = buf.pop(0)
                    hist = self._step(variables, hist, image, label)
                    scored += real
                    _sync_heartbeat()
            while buf:
                image, label, real = buf.pop(0)
                hist = self._step(variables, hist, image, label)
                scored += real
                _sync_heartbeat()
        else:
            for img, lbl in samples:
                if self.bucket is None:
                    # exact-shape protocol (reference main.py:896)
                    if not prefetched:
                        img, lbl = img[None], lbl[None]
                    hist = self._step(variables, hist, img, lbl)
                    scored += 1
                    _sync_heartbeat()
                else:
                    vh, vw = lbl.shape
                    img, lbl = pad_to_bucket(img, lbl, self.bucket)
                    hist = self._step_masked(
                        variables, hist, img[None], lbl[None],
                        jnp.asarray([vh, vw], jnp.int32))
                    scored += 1
                    _sync_heartbeat()
        n_shapes = len(shapes_seen)
        if eb > 1 and pad_total > 0 and (n_shapes > 3
                                         or pad_total * 2 > max(scored, 1)):
            # mixed-shape domain (GTAV is the one such val domain): every
            # distinct shape compiles its own batch-eb program AND pads its
            # final partial group, so batching can be a net loss here
            logging.getLogger(__name__).warning(
                "eval_batch=%d on a mixed-shape domain: %d distinct shapes, "
                "%d padded dummy forwards for %d real images — consider "
                "eval_batch=1 or bucket mode for this domain", eb, n_shapes,
                pad_total, scored)
        elif eb > 1 and n_shapes > 3:
            # no padding waste (every shape's count divides eval_batch) but
            # the compile bill is still per shape — say so explicitly
            logging.getLogger(__name__).warning(
                "eval_batch=%d over %d distinct shapes: one batch-%d "
                "compile per shape (no padded forwards)", eb, n_shapes, eb)
        hist_np = np.asarray(jax.device_get(hist)).astype(np.int64)
        hist_np = merge_shard_hists(hist_np, shard_count)
        result = evaluate_hist(hist_np, dataset_name=getattr(dataset, "name", "?"),
                               id2cat=getattr(dataset, "id2cat", None), log=log)
        result["dropped"] = dropped
        return result


class SlidingEvaluator(SegEvaluator):
    """Tile-based inference: every image is cut into fixed crop_size windows
    (data.joint_transforms.SlidingCrop geometry), the jitted forward runs at
    ONE compiled shape regardless of domain, and per-tile logits are averaged
    back into a full-resolution map. Trades a little overlap compute for
    zero shape-bucket recompiles on mixed-size eval sweeps."""

    def __init__(self, model, params, batch_stats, num_classes: int = 19,
                 crop_size: int = 1024, stride_rate: float = 2 / 3,
                 strict_pairs: bool = True, tile_batch: int = 8):
        super().__init__(model, params, batch_stats, num_classes,
                         bucket=crop_size, strict_pairs=strict_pairs)
        self.crop_size = crop_size
        self.stride_rate = stride_rate
        # tiles run through ONE compiled (tile_batch, cs, cs, 3) forward —
        # fewer dispatches (~1-2 ms each through the tunnel, CLAUDE.md) and
        # a real batch dim for the MXU; the last chunk zero-pads to the same
        # shape (eval mode, so padding tiles never affect real ones)
        self.tile_batch = max(1, tile_batch)
        self._logits = jax.jit(self._logits_step)

    def _logits_step(self, variables, image):
        # uint8 wire format: tiles ship as integers and cast on device
        # (exact; 4x fewer host->device bytes — the tunnel wire is the
        # sliding sweep's bottleneck, same as the exact-shape path)
        out = self.model.apply(variables, image.astype(jnp.float32),
                               train=False, mutable=False)
        return out["logits"]

    def _predict_full(self, img: np.ndarray) -> np.ndarray:
        cs = self.crop_size
        h, w = img.shape[:2]
        stride = int(math.ceil(cs * self.stride_rate))
        ys = list(range(0, max(h - cs, 0) + 1, stride)) or [0]
        xs = list(range(0, max(w - cs, 0) + 1, stride)) or [0]
        if ys[-1] + cs < h:
            ys.append(h - cs)
        if xs[-1] + cs < w:
            xs.append(w - cs)
        acc = np.zeros((h, w, self.num_classes), np.float32)
        cnt = np.zeros((h, w, 1), np.float32)
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        spans = []
        for sy in ys:
            for sx in xs:
                sy2, sx2 = max(0, min(sy, h - cs)), max(0, min(sx, w - cs))
                spans.append((sy2, sx2, min(sy2 + cs, h), min(sx2 + cs, w)))
        tb = self.tile_batch
        for lo in range(0, len(spans), tb):
            chunk = spans[lo:lo + tb]
            # keep the sample's wire dtype (uint8 stays uint8; the jitted
            # step casts on device)
            batch = np.zeros((tb, cs, cs, img.shape[-1]), img.dtype)
            for k, (sy2, sx2, ey, ex) in enumerate(chunk):
                batch[k, :ey - sy2, :ex - sx2] = img[sy2:ey, sx2:ex]
            logits = np.asarray(self._logits(variables, batch))
            for k, (sy2, sx2, ey, ex) in enumerate(chunk):
                acc[sy2:ey, sx2:ex] += logits[k, :ey - sy2, :ex - sx2]
                cnt[sy2:ey, sx2:ex] += 1
        return np.argmax(acc / np.maximum(cnt, 1), axis=-1).astype(np.int32)

    def run(self, dataset, max_images: Optional[int] = None,
            log=print, heartbeat=None) -> Dict[str, object]:
        from mrfp_tpu.ops.hist import fast_hist
        hist = np.zeros((self.num_classes, self.num_classes), np.int64)
        dropped = 0
        n = len(dataset) if max_images is None else min(len(dataset), max_images)
        for i in range(n):
            sample = dataset[i]
            # uint8 wire format: integer samples ship as-is (the tile
            # forward casts on device); float pipelines stay f32
            img = np.asarray(sample["image"])
            if img.dtype != np.uint8:
                img = img.astype(np.float32)
            lbl = np.asarray(sample["label"], np.int32)
            if img.shape[:2] != lbl.shape:
                dropped += 1
                continue
            pred = self._predict_full(img)
            hist += fast_hist(pred, lbl, self.num_classes)
            if heartbeat is not None:
                heartbeat()  # _predict_full fetched logits: a real sync
        result = evaluate_hist(hist, dataset_name=getattr(dataset, "name", "?"),
                               id2cat=getattr(dataset, "id2cat", None), log=log)
        result["dropped"] = dropped
        return result


def evaluate_hist(hist: np.ndarray, dataset_name: str = "?",
                  id2cat=None, log=print) -> Dict[str, object]:
    """metrics.evaluate_eval/print_evaluate_results (metrics.py:60-120):
    acc, acc_cls, per-class IoU table with precision/recall/TP/FP/FN, mIoU,
    fwavacc. Rows of ``hist`` are ground truth, columns prediction."""
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        freq = hist.sum(axis=1) / hist.sum()
        mean_iu = np.nanmean(iu)
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()

        tp = np.diag(hist).astype(np.float64)
        fp = hist.sum(axis=1) - tp
        fn = hist.sum(axis=0) - tp
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)

    id2cat = id2cat or {i: str(i) for i in range(hist.shape[0])}
    log(f"Dataset name: {dataset_name}")
    log("label_id      label    iU    Precision Recall TP     FP    FN")
    total = hist.sum()
    for idx in range(hist.shape[0]):
        with np.errstate(divide="ignore", invalid="ignore"):
            # fp/tp and fn/tp print inf/nan at tp=0, like the reference
            # (metrics.py:110-113)
            log(f"{idx:2d}    {str(id2cat.get(idx, '')):>13}   "
                f"{iu[idx] * 100:5.1f}  {precision[idx]:5.1f}     "
                f"{recall[idx]:5.1f}  {100 * tp[idx] / total:5.1f}  "
                f"{fp[idx] / tp[idx]:5.1f}   {fn[idx] / tp[idx]:5.1f}")
    log(f"mean {mean_iu}")
    logging.info("[dataset %s], [acc %.5f], [acc_cls %.5f], [mean_iu %.5f], "
                 "[fwavacc %.5f]", dataset_name, acc, acc_cls, mean_iu, fwavacc)
    return {"acc": float(acc), "acc_cls": float(acc_cls),
            "mean_iu": float(mean_iu), "fwavacc": float(fwavacc),
            "iu": iu, "hist": hist}
