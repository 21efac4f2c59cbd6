"""Training engine: jit train_step, EMA momentum model, epoch orchestration.

Re-implements the reference trainer (``Person-ReID/train_encodersKIT.py:45-249``)
and the outer pipeline loop (``Person-ReID/mainKIT.py:58-201``) as a
functional JAX program:

- one jit-compiled ``train_step`` fusing augmentation → forward (train-mode
  BN) → L2-normalize → weighted center + proxy losses → Adam update → EMA,
  batch sharded over the ``data`` mesh axis, params replicated (gradient
  all-reduce implicit in sharded autodiff);
- EMA momentum update as a single ``tree_map`` lerp over params AND batch
  stats, replacing the per-key state_dict loop
  (``train_encodersKIT.py:218-226``);
- Adam with torch-style L2 weight decay folded into the gradient
  (``torch.optim.Adam(weight_decay=...)``, ``mainKIT.py:99``) and the
  3-phase step LR schedule 100/100/50 at lr, lr/10, lr/100
  (``mainKIT.py:129-132``), settable per-epoch like ``lambda_lr_warmup``
  (``mainKIT.py:204-208``);
- per-epoch proxy/center mining via the shared FeatureExtractor
  (``train_encodersKIT.py:103-156``).
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import functools
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from daliid_tpu import losses as L
from daliid_tpu.augment.preprocess import decode_resize
from daliid_tpu.augment.train_augment import _augment_one
from daliid_tpu.augment.preprocess import IMAGENET_MEAN, IMAGENET_STD
from daliid_tpu.eval.features import FeatureExtractor
from daliid_tpu.parallel.mesh import batch_sharding, make_mesh, put_global, replicated_sharding
from daliid_tpu.train.proxies import mine_proxies_and_centers
from daliid_tpu.train.sampler import PKBatchSampler
from daliid_tpu.utils.profiling import PhaseTimer


_U64 = (1 << 64) - 1


def _encode_pcg64(gen: np.random.Generator) -> np.ndarray:
    """PCG64 generator state → uint64[6] (two 128-bit ints split hi/lo,
    plus the buffered-uint32 carry), for storage inside a checkpoint."""
    st = gen.bit_generator.state
    if st["bit_generator"] != "PCG64":
        raise ValueError(f"only PCG64 generators are checkpointable, got {st['bit_generator']}")
    s, inc = st["state"]["state"], st["state"]["inc"]
    return np.asarray(
        [s >> 64, s & _U64, inc >> 64, inc & _U64, st["has_uint32"], st["uinteger"]],
        dtype=np.uint64,
    )


def _decode_pcg64(arr) -> np.random.Generator:
    a = [int(x) for x in np.asarray(arr, dtype=np.uint64)]
    gen = np.random.default_rng(0)
    gen.bit_generator.state = {
        "bit_generator": "PCG64",
        "state": {"state": (a[0] << 64) | a[1], "inc": (a[2] << 64) | a[3]},
        "has_uint32": a[4],
        "uinteger": a[5],
    }
    return gen


def lr_schedule_values(base_lr: float, num_epochs: int = 250) -> np.ndarray:
    """Per-epoch LR: 100 epochs at lr, 100 at lr/10, 50 at lr/100, truncated
    or extended to ``num_epochs`` (``mainKIT.py:129-132``)."""
    vals = np.concatenate(
        [np.full(100, base_lr), np.full(100, base_lr / 10), np.full(50, base_lr / 100)]
    )
    if num_epochs <= len(vals):
        return vals[:num_epochs]
    return np.concatenate([vals, np.full(num_epochs - len(vals), base_lr / 100)])


def make_optimizer(learning_rate: float = 3.5e-4, weight_decay: float = 5e-4):
    """Adam with L2 decay added to the gradient *before* the moments —
    torch-``Adam(weight_decay=...)`` semantics, not decoupled AdamW."""
    return optax.inject_hyperparams(
        lambda learning_rate, weight_decay: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate),
        )
    )(learning_rate=learning_rate, weight_decay=weight_decay)


@dataclasses.dataclass
class TrainState:
    """All mutable training state (a pytree of arrays)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    momentum_params: Any
    momentum_batch_stats: Any

    def online_variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def momentum_variables(self):
        return {"params": self.momentum_params, "batch_stats": self.momentum_batch_stats}


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "batch_stats", "opt_state", "momentum_params", "momentum_batch_stats"],
    meta_fields=[],
)


def microbatch_slots(batch: int, n: int, paired: bool) -> np.ndarray:
    """(n, batch//n) int32 slot indices assigning batch slots to grad-accum
    microbatches: STRIDED (chunk c takes slots ``c::n``; for paired AT
    batches the [clean, distorted] PAIRS stride, keeping each pair adjacent
    within its chunk). PK batches are identity-grouped, so a contiguous
    assignment could hand a chunk a single identity and silently empty the
    triplet losses' negative pools; striding round-robins identities and
    spreads any tail padding slots evenly across chunks."""
    if batch % n:
        raise ValueError(f"grad_accum={n} must divide the batch size {batch}")
    mb = batch // n
    if paired:
        if (batch // 2) % n:
            raise ValueError(
                f"paired AT batches microbatch in [clean, distorted] pair "
                f"units: grad_accum={n} must divide the pair count {batch // 2}"
            )
        pairs = np.arange(batch, dtype=np.int32).reshape(batch // 2, 2)
        return pairs.reshape(mb // 2, n, 2).swapaxes(0, 1).reshape(n, mb)
    return np.arange(batch, dtype=np.int32).reshape(mb, n).T.copy()


class Trainer:
    """Epoch-level orchestration mirroring ``trainer`` + ``mainKIT.main``."""

    def __init__(
        self,
        bundle_online,
        bundle_momentum,
        sampler: PKBatchSampler,
        img_size=(256, 128),
        base_lr: float = 3.5e-4,
        weight_decay: float = 5e-4,
        tau: float = 0.1,
        beta: float = 0.999,
        lambda_proxy: float = 1.0,
        lambda_distortion: float = 0.0,  # optional clean<->AT consistency
                                         # (losses.py:90-148; off in the
                                         # reference train path)
        num_epochs: int = 250,
        num_proxies: int = 5,
        num_iter: int = 1,  # inner iterations per epoch over the same PK
                            # loader without re-mining (--num_iter,
                            # train_encodersKIT.py:161-245; default 1)
        momentum_on_feature_extraction: bool = False,  # mainKIT.py:333-334
        mesh=None,
        compute_dtype=jnp.bfloat16,
        seed: int = 12,
        decode_workers: int = 16,
        extractor_batch: int = 512,
        mining_quantize: str | None = None,  # int8 PTQ for the per-epoch
                                             # whole-train-set re-embedding
                                             # (train_encodersKIT.py:110);
                                             # eval extraction stays fp
        mining_calib_batches: int = 1,
        grad_accum: int = 1,  # microbatches per optimizer step: the batch is
                              # split into N STRIDED chunks (slot c::N; pairs
                              # move as units, so identities round-robin and
                              # triplet negative pools stay populated) whose
                              # grads combine weighted by each chunk's
                              # valid-slot count before ONE Adam update + ONE
                              # EMA lerp. Memory knob: saved activations
                              # scale with the microbatch, so >HBM batches
                              # avoid XLA's auto-remat recompute. Standard
                              # grad-accumulation semantics: each chunk's
                              # distortion-weighted losses normalize over the
                              # chunk (exactly the full-batch step when the
                              # per-sample weights are uniform and every
                              # class owns mined proxies — both true in the
                              # shipped pipeline — including under padding);
                              # BN batch stats thread sequentially through
                              # the chunks.
    ):
        self.module = bundle_online.module
        import inspect as _inspect

        # SIE-conditioned backbones (TransReID, vit.py camera/view embeddings)
        # take camera_ids in their forward; detect once and plumb batch camids
        _call_params = _inspect.signature(type(self.module).__call__).parameters
        self._takes_camera_ids = "camera_ids" in _call_params
        # margin-headed models (TransReIDJPM id_loss_type != softmax) take the
        # batch labels in their forward (classifier(feat, label),
        # make_models.py:361-363)
        self._takes_labels = "labels" in _call_params
        self.sampler = sampler
        self.img_size = tuple(img_size)
        self.tau = tau
        self.beta = beta
        self.lambda_proxy = lambda_proxy
        self.lambda_distortion = lambda_distortion
        self.paired_batches = sampler.kind_of_transform == 1
        self.num_epochs = num_epochs
        self.num_proxies = num_proxies
        self.num_iter = max(1, num_iter)
        self.momentum_on_feature_extraction = momentum_on_feature_extraction
        self.mesh = mesh if mesh is not None else make_mesh()
        self.compute_dtype = compute_dtype
        import os as _os

        self.decode_workers = max(1, min(decode_workers, 2 * (_os.cpu_count() or 1)))
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.key(seed)
        # phase accounting: the reference's feature-extraction / clustering /
        # finetuning wall-clock totals (mainKIT.py:102-104,193-201)
        self.timer = PhaseTimer()
        self._lr_values = lr_schedule_values(base_lr, num_epochs)
        self.weight_decay = weight_decay

        self.optimizer = make_optimizer(base_lr, weight_decay)
        replicated = replicated_sharding(self.mesh)
        opt_state = self.optimizer.init(bundle_online.variables["params"])
        self.state = put_global(
            TrainState(
                params=bundle_online.variables["params"],
                batch_stats=bundle_online.variables.get("batch_stats", {}),
                opt_state=opt_state,
                momentum_params=bundle_momentum.variables["params"],
                momentum_batch_stats=bundle_momentum.variables.get("batch_stats", {}),
            ),
            replicated,
        )
        if grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
        self.grad_accum = int(grad_accum)
        self._batch_shard = batch_sharding(self.mesh)
        self._replicated = replicated
        # shared extractor: reused across epochs for proxy mining + validation
        self.extractor = FeatureExtractor(
            bundle_online,
            img_size=self.img_size,
            batch_size=extractor_batch,
            mesh=self.mesh,
            compute_dtype=compute_dtype,
            decode_workers=decode_workers,
        )
        # optional int8 mining extractor (VERDICT r3 item 8): the epoch
        # re-embedding is eval-mode inference, so PTQ applies; a SEPARATE
        # extractor keeps validation/eval extraction full-precision.
        # update_variables drops its scales, so each epoch recalibrates on
        # the first mining batches of the NEW weights.
        self._mining_extractor = (
            FeatureExtractor(
                bundle_online,
                img_size=self.img_size,
                batch_size=extractor_batch,
                mesh=self.mesh,
                compute_dtype=compute_dtype,
                decode_workers=decode_workers,
                quantize=mining_quantize,
                calib_batches=mining_calib_batches,
            )
            if mining_quantize is not None
            else None
        )
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------
    def _build_train_step(self):
        module = self.module
        tau = self.tau
        beta = self.beta
        lambda_proxy = self.lambda_proxy
        lambda_distortion = self.lambda_distortion
        paired = self.paired_batches
        num_epochs = float(self.num_epochs)
        # exact static positive bound for the proxy loss (and a 12x smaller
        # top_k than the 64 default at num_proxies=5)
        num_proxies = self.num_proxies
        optimizer = self.optimizer
        grad_accum = self.grad_accum
        dtype = self.compute_dtype
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        # Augmentation is dispatched as its OWN jit: measured on v5e, fusing
        # the vmapped crop/jitter/erase into the grad program makes XLA
        # schedule it ~5x slower (122 ms vs 25 ms standalone for a 384
        # batch). On TPU the fused Pallas kernel replaces the XLA chain
        # entirely (2.3 ms vs 25 ms for the same batch); on a multi-device
        # mesh it runs shard_map'd per device (nothing in the kernel is
        # cross-device), so pods keep the kernel win.
        use_pallas_augment = jax.default_backend() == "tpu"

        if use_pallas_augment and self.mesh.devices.size == 1:
            from daliid_tpu.ops.fused_augment import fused_augment_batch

            @functools.partial(
                jax.jit,
                in_shardings=(self._batch_shard, None),
                out_shardings=self._batch_shard,
            )
            def augment(images_u8, key):
                return fused_augment_batch(images_u8, key, dtype=dtype, interpret=False)

        elif use_pallas_augment:
            from daliid_tpu.ops.fused_augment import fused_augment_batch_sharded

            mesh = self.mesh

            @functools.partial(
                jax.jit,
                in_shardings=(self._batch_shard, None),
                out_shardings=self._batch_shard,
            )
            def augment(images_u8, key):
                return fused_augment_batch_sharded(
                    images_u8, key, mesh, dtype=dtype, interpret=False
                )

        else:

            @functools.partial(
                jax.jit,
                in_shardings=(self._batch_shard, None),
                out_shardings=self._batch_shard,
            )
            def augment(images_u8, key):
                keys = jax.random.split(key, images_u8.shape[0])
                return jax.vmap(
                    lambda im, k: _augment_one(
                        im, k, 10, 0.4, 0.3, 0.4, (0.05, 0.30), (0.3, 3.3), mean, std
                    )
                )(images_u8, keys).astype(dtype)

        self._augment = augment
        takes_camera_ids = self._takes_camera_ids
        takes_labels = self._takes_labels

        @functools.partial(
            jax.jit,
            donate_argnums=(0, 1),
            in_shardings=(
                self._replicated,   # state
                self._batch_shard,  # images (augmented, compute dtype)
                self._batch_shard,  # labels
                self._batch_shard,  # distortions
                self._batch_shard,  # mask
                self._batch_shard,  # camids
                self._replicated,   # centers
                self._replicated,   # proxies
                self._replicated,   # proxy_labels
                None,               # epoch (scalar)
                None,               # key
            ),
            out_shardings=(self._replicated, self._replicated),
        )
        def train_step(
            state: TrainState,
            images,
            labels,
            distortions,
            mask,
            camids,
            centers,
            proxies,
            proxy_labels,
            epoch,
            key,
        ):
            _, droppath_key = jax.random.split(key)

            def loss_fn(params, batch_stats, images, labels, distortions,
                        mask, camids, droppath_key):
                extra = {"camera_ids": camids} if takes_camera_ids else {}
                if takes_labels:
                    extra["labels"] = labels
                out, updates = module.apply(
                    {"params": params, "batch_stats": batch_stats},
                    images,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"droppath": droppath_key},  # stochastic depth (ViT)
                    **extra,
                )
                id_loss = 0.0
                if (
                    isinstance(out, tuple) and len(out) == 2
                    and isinstance(out[0], (list, tuple))
                ):
                    # JPM multi-branch train mode: ([scores...], [feats...])
                    # (build_transformer_local, make_models.py:351-377). The
                    # TransReID recipe weights the global branch 1/2 and the
                    # local branches 1/2 jointly, for both the ID loss and
                    # the hardest-triplet loss; ours uses the distortion-
                    # weighted variants so AT pairing composes with JPM.
                    scores, branch_feats = out

                    def wce(logits_):
                        l, _ = L.weighted_cross_entropy_loss(
                            jax.nn.softmax(logits_, axis=-1), labels, distortions,
                            epoch, num_epochs, sample_mask=mask,
                        )
                        return l

                    def wtri(f):
                        fn = f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-9)
                        return L.weighted_softmax_triplet_loss(
                            fn, labels, distortions, epoch, num_epochs,
                            tau=tau, sample_mask=mask,
                        )

                    id_terms = [wce(s) for s in scores]
                    tri_terms = [wtri(f) for f in branch_feats]

                    def branch_mix(terms):
                        if len(terms) == 1:
                            return terms[0]
                        return 0.5 * terms[0] + 0.5 * jnp.mean(jnp.stack(terms[1:]))

                    id_loss = branch_mix(id_terms) + branch_mix(tri_terms)
                    # the DaliID center/proxy losses act on the model's eval
                    # representation: concat([global, locals/4])
                    # (make_models.py:375-377) — the same space the epoch
                    # miner embeds with
                    out = jnp.concatenate(
                        [branch_feats[0]] + [f / 4.0 for f in branch_feats[1:]], axis=1
                    )
                elif isinstance(out, tuple) and len(out) == 2:
                    # classifier-headed models (densenet121(num_classes>0),
                    # Encoders.py:633-637) return (embedding, logits) in train
                    # mode: add the distortion-weighted CE on the logits
                    # (BatchWeightedCrossEntropyLoss, losses.py:152-187)
                    out, logits = out
                    probs = jax.nn.softmax(logits, axis=-1)
                    id_loss, _ = L.weighted_cross_entropy_loss(
                        probs, labels, distortions, epoch, num_epochs, sample_mask=mask
                    )
                fvs = out / (jnp.linalg.norm(out, axis=1, keepdims=True) + 1e-9)
                center_loss, aux = L.weighted_center_loss(
                    fvs, labels, distortions, centers, epoch, num_epochs, tau=tau, sample_mask=mask
                )
                proxy_loss = L.weighted_proxy_loss(
                    fvs, labels, distortions, proxies, proxy_labels, epoch, num_epochs,
                    tau=tau, sample_mask=mask, p_max=num_proxies,
                )
                total = center_loss + lambda_proxy * proxy_loss + id_loss
                if lambda_distortion > 0.0 and paired:
                    # adjacent [clean, distorted] slots (sampler emission
                    # order, train_encodersKIT.py:382-394)
                    dist_loss = L.paired_distortion_loss(
                        fvs[0::2], fvs[1::2], distortions[1::2], epoch, num_epochs,
                        pair_mask=mask[1::2],
                    )
                    total = total + lambda_distortion * dist_loss
                return total, (updates["batch_stats"], center_loss, proxy_loss, aux)

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            if grad_accum == 1:
                (total, (new_stats, center_loss, proxy_loss, aux)), grads = grad_fn(
                    state.params, state.batch_stats, images, labels,
                    distortions, mask, camids, droppath_key,
                )
            else:
                # microbatched forward+backward: each chunk's backward
                # completes before the next forward, so saved activations
                # scale with B/grad_accum instead of B (the transformer-train
                # auto-remat lever, BENCH.md §transformer-train). One Adam
                # update + one EMA lerp on the combined grads; BN stats
                # thread sequentially (torch grad-accumulation semantics).
                #
                # Chunk assignment is STRIDED (chunk c takes slots c::n;
                # pairs move as units), not contiguous: PK batches are
                # identity-grouped, so contiguous chunks can hold a single
                # identity and silently empty the triplet losses' negative
                # pools (review finding r5); striding round-robins
                # identities AND spreads the tail padding slots evenly.
                #
                # Chunks combine weighted by their VALID-slot counts, not
                # uniformly: each chunk's losses normalize over the chunk,
                # and padded/masked slots (mesh-multiple padding, <K-image
                # identities) would otherwise rescale the gradient. With
                # uniform per-sample loss weights this recombination is
                # exactly the full-batch gradient whatever the padding, as
                # long as every sample's class owns mined proxies (the
                # proxy loss additionally normalizes by its has_pos count —
                # always true in the shipped pipeline, which mines proxies
                # for every train class each epoch); with distortion
                # weights it is the standard grad-accum approximation
                # (chunk-level normalization).
                n = grad_accum
                batch = images.shape[0]
                # only the (n, mb) slot table and per-chunk keys are scanned;
                # each chunk GATHERS its slice from the full batch inside the
                # body, so peak memory holds one chunk's copy instead of a
                # full reordered batch (the memory-relief flag should not
                # itself add a whole-batch HBM copy — review finding r5)
                slots = jnp.asarray(microbatch_slots(batch, n, paired))
                xs = (slots, jax.random.split(droppath_key, n))

                first = (
                    images[slots[0]], labels[slots[0]], distortions[slots[0]],
                    mask[slots[0]], camids[slots[0]], xs[1][0],
                )
                out_sd = jax.eval_shape(
                    loss_fn, state.params, state.batch_stats, *first
                )
                # (total, center_loss, proxy_loss, aux) accumulate in f32
                m_sd = (out_sd[0], out_sd[1][1], out_sd[1][2], out_sd[1][3])
                zero_m = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.float32), m_sd)
                zero_g = jax.tree.map(jnp.zeros_like, state.params)

                def body(carry, x):
                    stats, g_sum, m_sum, w_sum = carry
                    sl, key_c = x
                    mask_c = mask[sl]
                    (tot, (stats, c_l, p_l, aux)), g = grad_fn(
                        state.params, stats, images[sl], labels[sl],
                        distortions[sl], mask_c, camids[sl], key_c,
                    )
                    w_c = mask_c.sum().astype(jnp.float32)  # valid slots
                    g_sum = jax.tree.map(lambda a, b: a + w_c * b, g_sum, g)
                    m_sum = jax.tree.map(
                        lambda a, b: a + w_c * b.astype(jnp.float32),
                        m_sum, (tot, c_l, p_l, aux),
                    )
                    return (stats, g_sum, m_sum, w_sum + w_c), None

                (new_stats, g_sum, m_sum, w_sum), _ = jax.lax.scan(
                    body, (state.batch_stats, zero_g, zero_m, jnp.float32(0.0)), xs
                )
                denom = jnp.maximum(w_sum, 1.0)
                grads = jax.tree.map(lambda g: g / denom, g_sum)
                total, center_loss, proxy_loss, aux = jax.tree.map(
                    lambda m: m / denom, m_sum
                )
            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            # EMA over the full model state, replacing the per-key
            # state_dict loop (train_encodersKIT.py:218-226)
            ema = lambda m, o: jax.tree.map(lambda a, b: beta * a + (1.0 - beta) * b, m, o)
            new_state = TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                momentum_params=ema(state.momentum_params, new_params),
                momentum_batch_stats=ema(state.momentum_batch_stats, new_stats),
            )
            # weight-norm diagnostic (train_encodersKIT.py:229-233)
            weights_sum = sum(jnp.sum(p.astype(jnp.float32) ** 2) for p in jax.tree.leaves(new_params))
            metrics = {
                "loss": total,
                "center_loss": center_loss,
                "proxy_loss": proxy_loss,
                "batch_acc_bal": aux["batch_acc_bal"],
                "avg_max_prob": aux["avg_max_prob"],
                "weights_sum": weights_sum,
            }
            return new_state, metrics

        return train_step

    # ------------------------------------------------------------------
    def set_epoch_hyperparams(self, epoch: int) -> float:
        """Per-epoch LR from the 3-phase schedule (``lambda_lr_warmup``,
        ``mainKIT.py:142-144``). Returns the LR used."""
        lr = float(self._lr_values[min(epoch - 1, len(self._lr_values) - 1)])
        self.state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        self.state.opt_state.hyperparams["weight_decay"] = jnp.asarray(self.weight_decay)
        return lr

    def mine_proxies(self, verbose: bool = False, use_momentum: bool = False):
        """Whole-train-set re-embedding + per-class mining
        (``train_encodersKIT.py:103-156``). ``use_momentum`` embeds with the
        EMA model instead (``--momentum_on_feature_extraction``,
        ``mainKIT.py:333-334``)."""
        extractor = self._mining_extractor or self.extractor
        if use_momentum:
            extractor.update_variables(
                {"params": self.state.momentum_params,
                 "batch_stats": self.state.momentum_batch_stats}
            )
        else:
            extractor.update_variables(
                {"params": self.state.params, "batch_stats": self.state.batch_stats}
            )
        feats = extractor.extract(self.sampler.table, verbose=verbose)
        class_idx = np.asarray(
            [self.sampler.label_to_class[l] for l in self.sampler.labels], np.int32
        )
        pset = mine_proxies_and_centers(
            feats, class_idx, self.sampler.num_classes, self.num_proxies, self._rng
        )
        if verbose:
            print(
                f"Mean Max Proxies Positive Distances: {pset.mean_max_intra:.3f}, "
                f"Min Negative Distance: {pset.min_inter:.3f}"
            )
        return pset

    def _decode_batch(self, paths) -> np.ndarray:
        h, w = self.img_size
        from daliid_tpu.data.native_loader import decode_resize_batch, native_loader_available

        if native_loader_available() and all(str(p).lower().endswith((".jpg", ".jpeg")) for p in paths):
            return decode_resize_batch(paths, h, w, num_threads=self.decode_workers)

        out = np.empty((len(paths), h, w, 3), np.uint8)

        def work(i):
            out[i] = decode_resize(paths[i], h, w)

        with cf.ThreadPoolExecutor(self.decode_workers) as ex:
            list(ex.map(work, range(len(paths))))
        return out

    def train_epoch(self, epoch: int, verbose: bool = False) -> Dict[str, float]:
        """One pipeline iteration: mine proxies, run all PK batches."""
        lr = self.set_epoch_hyperparams(epoch)
        with self.timer.span("proxy_mining"):
            pset = self.mine_proxies(verbose=verbose, use_momentum=self.momentum_on_feature_extraction)
        centers = put_global(np.asarray(pset.centers), self._replicated)
        proxies = put_global(np.asarray(pset.proxies), self._replicated)
        proxy_labels = put_global(np.asarray(pset.proxy_labels), self._replicated)

        n_batches = 0
        step_metrics = []  # device values; fetched once after the loop so no
                           # per-step host sync serializes dispatch
        epoch_arr = jax.device_put(jnp.float32(epoch), self._replicated)
        t0 = time.time()
        finetune_t0 = time.time()

        def stage_batch(batch):
            """Decode + pad + device_put one batch — runs on the prefetch
            thread so the NEXT batch's host decode AND H2D staging overlap
            the current device step (the reference overlaps decode only, via
            DataLoader workers; H2D is serial there)."""
            images_u8 = self._decode_batch(batch.paths)
            # pad to a multiple of the mesh size with masked slots so the
            # batch shards evenly (padding never reaches a loss)
            n_dev = self.mesh.devices.size
            pad = (-len(images_u8)) % n_dev
            labels, distortions, mask = batch.labels, batch.distortions, batch.mask
            camids = batch.camids
            if pad:
                images_u8 = np.concatenate([images_u8, np.repeat(images_u8[:1], pad, 0)])
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                distortions = np.concatenate([distortions, np.zeros(pad, np.int32)])
                mask = np.concatenate([mask, np.zeros(pad, bool)])
                camids = np.concatenate([camids, np.zeros(pad, np.int32)])
            put = lambda a: put_global(a, self._batch_shard)
            return (put(images_u8), put(labels), put(distortions), put(mask), put(camids))

        # the reference re-iterates the same loader num_iter times per epoch
        # between minings (train_encodersKIT.py:161)
        batches = [b for _ in range(self.num_iter) for b in self.sampler.epoch()]
        with cf.ThreadPoolExecutor(1) as prefetcher:
            futures = [prefetcher.submit(stage_batch, b) for b in batches[:1]]
            for i in range(len(batches)):
                if i + 1 < len(batches):
                    futures.append(prefetcher.submit(stage_batch, batches[i + 1]))
                images_u8, labels, distortions, mask, camids = futures[i].result()
                futures[i] = None  # free the staged device buffers
                self._key, step_key = jax.random.split(self._key)
                images = self._augment(images_u8, step_key)
                self.state, metrics = self._train_step(
                    self.state,
                    images,
                    labels,
                    distortions,
                    mask,
                    camids,
                    centers,
                    proxies,
                    proxy_labels,
                    epoch_arr,
                    step_key,
                )
                n_batches += 1
                step_metrics.append(metrics)

        self.timer.add("finetuning", time.time() - finetune_t0)
        # single host sync for the whole epoch's diagnostics
        step_metrics = jax.device_get(step_metrics)
        totals: Dict[str, float] = {}
        for metrics in step_metrics:
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        means = {k: v / max(n_batches, 1) for k, v in totals.items()}
        means["lr"] = lr
        means["epoch_seconds"] = time.time() - t0
        means["proxy_min_inter"] = pset.min_inter
        means["proxy_mean_max_intra"] = pset.mean_max_intra
        if verbose:
            print(
                f"Mean Center Loss: {means.get('center_loss', 0):.7f}, "
                f"Mean Proxy Loss: {means.get('proxy_loss', 0):.7f}"
            )
            print(f"Mean Final Loss: {means.get('loss', 0):.7f} ({n_batches} batches, lr={lr:g})")
        return means

    # ------------------------------------------------------------------
    # Host RNG capture/restore, so ``--resume`` replays the exact random
    # stream a continuous run would have consumed (augmentation keys,
    # proxy-mining draws, sampler shuffles). The reference cannot do this:
    # it persists only best-metric state_dicts (mainKIT.py:165-170).
    def rng_state(self) -> Dict[str, np.ndarray]:
        """All host-side randomness as fixed-shape arrays (checkpointable)."""
        return {
            "key": np.asarray(jax.random.key_data(self._key)),
            "trainer": _encode_pcg64(self._rng),
            "sampler": _encode_pcg64(self.sampler._rng),
        }

    def set_rng_state(self, rng: Dict[str, np.ndarray]) -> None:
        self._key = jax.random.wrap_key_data(jnp.asarray(rng["key"], jnp.uint32))
        self._rng = _decode_pcg64(rng["trainer"])
        self.sampler._rng = _decode_pcg64(rng["sampler"])

    # convenience accessors mirroring (online, momentum) model pairs
    def online_variables(self):
        return jax.device_get(
            {"params": self.state.params, "batch_stats": self.state.batch_stats}
        )

    def momentum_variables(self):
        return jax.device_get(
            {"params": self.state.momentum_params, "batch_stats": self.state.momentum_batch_stats}
        )
