"""Composed-pipeline parity oracle: the reference's ASSEMBLED trainer and
validator, run literally under CPU torch, against our Trainer — same initial
weights, same batches — over multiple epochs (VERDICT r2 top item).

Per-component oracles (``test_losses_vs_reference``, ``test_torch_port_zoo``)
cannot catch *composition* bugs: sampler→loss weighting→optimizer→EMA
interplay, BN train-mode drift, mining-order effects. This test runs the
reference's own ``trainer.train`` (``Person-ReID/train_encodersKIT.py:74-249``)
and ``validateModels.validate`` (``Person-ReID/validateModels.py:35-76``)
end-to-end for 3 epochs on the hermetic synthetic dataset and asserts, epoch
by epoch:

- whole-train-set extraction features match (eval-mode composed forward,
  ``train_encodersKIT.py:110`` / ``getFeatures.py:47-71`` run literally);
- mined proxies/centers match, including the farthest-point *indices*
  (``selectProxiesByTriagulation``, ``train_encodersKIT.py:252-284``), with
  the seed sample aligned through a shared legacy-RandomState stream;
- every batch's center loss and proxy loss match
  (``train_encodersKIT.py:200-208``);
- post-epoch online AND momentum (EMA) weights match, including BN running
  stats (the torch unbiased-running-var rule, ``models/norm.py``);
- final CMC/mAP from the literal ``validateModels.validate`` equals ours.

**Lockstep protocol.** The reference side resyncs to OUR epoch-start state
(weights, EMA weights, and Adam moments) before each epoch; each epoch is
exactly ONE optimizer step (P = all classes → one PK batch per epoch), so
every weight comparison is a single-step comparison from identical state.
Anything looser is not meaningful across frameworks (measured here):

- Adam's step for a weight whose gradient is below cross-framework fp
  noise is ``±lr·sign(noise)`` — with ``weight_decay·p ≈ 2e-8`` the
  effective gradient of dead weights, ~11% of ResNet-50's weights flip a
  full ``2·lr`` on a step in this setup (measured; the exact max diff);
- one step later the *forward* runs on flip-perturbed weights, and an
  untrained 50-layer ResNet amplifies perturbations layer by layer —
  measured: after a SECOND free step the two sides' updates decorrelate to
  ``q50(|Δw|) ≈ lr/2`` and deep-layer BN running stats drift O(0.5),
  with per-batch LOSSES still matching to 1e-3 (aggregates are stable;
  per-weight trajectories are chaotic).

Single-step lockstep keeps the typical weight at fp noise (q50 bound,
measured 7e-9 on the first epoch) with only the flip population at
``2·lr`` (bounded max + population fraction); a composition bug (wrong
weighting, BN-mode flip, EMA order, optimizer semantics) shifts the BULK
of weights to the lr scale and fails loudly.

What is shared rather than literal (and why):

- **batch tensors**: our sampler + augmentation produce each batch's
  post-augment images once; the reference trainer consumes the identical
  tensors (its ``DataLoader``/``samplePKBatches`` are replaced by a replay
  loader). torchvision is absent from this image, so the reference's own
  random transforms cannot run; random-augment parity is covered
  distributionally in ``test_augment``/``test_fused_augment``. Everything
  downstream of the tensors — the reference's batch-assembly loop, losses,
  Adam, EMA, mining, validation — is the literal reference code.
- **stubs**: ``torchvision.transforms`` Resize/ToTensor/Normalize are
  faithful PIL/numpy implementations (only these three are executed, by
  ``getFeatures.sample``); ``torchreid.utils.tools.read_image`` is the
  literal PIL recipe; ``torchreid.metrics.evaluate_rank`` maps to our C++
  rank oracle (bit-parity vs rank_cy established in ``test_metrics``).

Runs on the 8-device virtual CPU mesh; marked slow (~4 min).
"""

from __future__ import annotations

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_DIR = "/root/reference/Person-ReID"

# DALIID_TEST_SEED soaks the whole oracle (init weights, dataset, sampler,
# mining streams) under fresh seeds — same knob as the loss parity tests
SEED = int(os.environ.get("DALIID_TEST_SEED", "12"))
EPOCHS = 3
TOTAL_EPOCHS = 25     # loss-schedule horizon (number_of_epoches)
P, K = 10, 4          # P = all classes -> ONE batch (= one step) per epoch,
                      # so per-epoch lockstep is per-step (see docstring)
IMG = (64, 32)
TAU = 0.1
BETA = 0.9
LR = 3.5e-4
WD = 5e-4
LAMBDA_PROXY = 1.0


class _LegacyRng:
    """np.random.Generator-compatible shim over a legacy RandomState so our
    miner's seed draws replay the reference's global ``np.random.choice(n)``
    sequence (``train_encodersKIT.py:258``) after ``np.random.seed(s)``."""

    def __init__(self, seed: int):
        self._rs = np.random.RandomState(seed)

    def integers(self, n: int) -> int:
        return int(self._rs.choice(n))


def _epoch_seed(epoch: int) -> int:
    return SEED * 1000 + epoch


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState (count, mu, nu) inside the optax chain."""
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu"):
        return opt_state
    children = []
    if isinstance(opt_state, (tuple, list)):
        children = list(opt_state)
    elif hasattr(opt_state, "inner_state"):
        children = [opt_state.inner_state]
    for c in children:
        found = _find_adam_state(c)
        if found is not None:
            return found
    return None


def _adam_state_to_torch_keys(opt_state, batch_stats):
    """Our Adam moments → torch-format key dict (same exporter as the
    weights; the running_* keys it emits for BN are ignored downstream —
    only parameter keys carry moments)."""
    from daliid_tpu.models.torch_port import resnet50_reid_to_torch_keys

    ad = _find_adam_state(opt_state)
    assert ad is not None
    mu_sd = resnet50_reid_to_torch_keys({"params": ad.mu, "batch_stats": batch_stats})
    nu_sd = resnet50_reid_to_torch_keys({"params": ad.nu, "batch_stats": batch_stats})
    return int(ad.count), mu_sd, nu_sd


# --------------------------------------------------------------------------
# Stub modules for the reference's unavailable imports
# --------------------------------------------------------------------------


def _install_reference_stubs():
    """torchvision / torchreid stubs sufficient to import and run the
    reference trainer + validator. Only Resize/ToTensor/Normalize/Compose and
    read_image carry real behavior (see module docstring)."""
    from PIL import Image

    if "torchvision" in sys.modules and not getattr(
        sys.modules["torchvision"], "_daliid_stub", False
    ):  # pragma: no cover - real torchvision would be even better
        return

    import torch

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

    class Resize:
        # getFeatures.py:18 passes interpolation=3 (PIL BICUBIC);
        # train_encodersKIT.py:313 passes InterpolationMode.BICUBIC
        def __init__(self, size, interpolation=2):
            self.size = size  # (h, w)

        def __call__(self, img):
            h, w = self.size
            if img.size == (w, h):
                return img
            return img.resize((w, h), Image.BICUBIC)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class _NeverCalled:
        """Placeholder for augment transforms the replay never constructs."""

        def __init__(self, *a, **k):  # pragma: no cover
            raise RuntimeError("stub transform must not be constructed in the oracle")

    class _InterpolationMode:
        BICUBIC = 3

    tv = types.ModuleType("torchvision")
    tv._daliid_stub = True
    tv.models = types.SimpleNamespace(
        resnet50=_NeverCalled, densenet121=_NeverCalled, inception_v3=_NeverCalled,
        vit_b_16=_NeverCalled, efficientnet_b0=_NeverCalled,
    )
    tv.transforms = types.ModuleType("torchvision.transforms")
    for name, obj in dict(
        Compose=Compose, Resize=Resize, ToTensor=ToTensor, Normalize=Normalize,
        ToPILImage=_NeverCalled, RandomErasing=_NeverCalled,
        RandomHorizontalFlip=_NeverCalled, ColorJitter=_NeverCalled,
        RandomCrop=_NeverCalled, GaussianBlur=_NeverCalled, Grayscale=_NeverCalled,
        RandomGrayscale=_NeverCalled,
        functional=types.SimpleNamespace(InterpolationMode=_InterpolationMode),
    ).items():
        setattr(tv.transforms, name, obj)
    tv.utils = types.SimpleNamespace(save_image=lambda *a, **k: None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models  # type: ignore[assignment]
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.utils"] = tv.utils  # type: ignore[assignment]

    def read_image(path):
        # literal torchreid.utils.tools.read_image recipe
        return Image.open(path).convert("RGB")

    from daliid_tpu.metrics.cpp_ref import evaluate_rank_cpp

    def evaluate_rank(distmat, q_pids, g_pids, q_camids, g_camids,
                      use_metric_cuhk03=False, max_rank=50):
        assert not use_metric_cuhk03
        cmc, mAP = evaluate_rank_cpp(
            np.asarray(distmat, np.float32),
            np.asarray(q_pids).astype(np.int64),
            np.asarray(g_pids).astype(np.int64),
            np.asarray(q_camids).astype(np.int64),
            np.asarray(g_camids).astype(np.int64),
            max_rank=max_rank,
        )
        return cmc, mAP

    tr = types.ModuleType("torchreid")
    tr.utils = types.SimpleNamespace(tools=types.SimpleNamespace(read_image=read_image))
    tr.metrics = types.SimpleNamespace(evaluate_rank=evaluate_rank)
    sys.modules["torchreid"] = tr

    sys.modules.setdefault(
        "termcolor", types.SimpleNamespace(colored=lambda s, *a, **k: s)
    )
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)


# --------------------------------------------------------------------------
# torchvision-compatible ResNet-50 trunk (structure + naming mirror, needed
# because torchvision itself is absent; the ReID wrapper around it is the
# reference's literal Encoders.ResNet50ReID)
# --------------------------------------------------------------------------


def _build_torch_resnet50_base(torch_mod):
    import torch.nn as nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Base(nn.Module):
        """torchvision resnet50 attribute/naming layout (v1.5 bottleneck:
        stride on conv2), as consumed by Encoders.ResNet50ReID."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            inplanes = 64
            for i, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
            ):
                layers = []
                for b in range(blocks):
                    s = stride if b == 0 else 1
                    down = None
                    if s != 1 or inplanes != planes * 4:
                        down = nn.Sequential(
                            nn.Conv2d(inplanes, planes * 4, 1, stride=s, bias=False),
                            nn.BatchNorm2d(planes * 4),
                        )
                    layers.append(Bottleneck(inplanes, planes, s, down))
                    inplanes = planes * 4
                setattr(self, f"layer{i}", nn.Sequential(*layers))

    return Base()


# --------------------------------------------------------------------------
# Phase A: run OUR trainer with recording hooks
# --------------------------------------------------------------------------


def _run_ours(root, kind_of_transform=1):
    from daliid_tpu.data import make_synthetic_dataset
    from daliid_tpu.eval.validate import Validator
    from daliid_tpu.models.factory import ModelBundle
    from daliid_tpu.models.resnet import ResNet50ReID
    from daliid_tpu.models.torch_port import variables_to_torch
    from daliid_tpu.train import trainer as trainer_mod
    from daliid_tpu.train import proxies as proxies_mod
    from daliid_tpu.train.sampler import PKBatchSampler
    from daliid_tpu.train.trainer import Trainer

    splits, turb = make_synthetic_dataset(
        root, num_ids=10, imgs_per_id_train=8, imgs_per_id_test=4,
        height=IMG[0], width=IMG[1], with_turbulence=True,
        turbulence_splits=("train",),
    )

    m = ResNet50ReID()  # full (3, 4, 6, 3) — the reference's actual backbone
    v = m.init({"params": jax.random.key(SEED)}, jnp.zeros((1, *IMG, 3)), train=False)
    online = ModelBundle(module=m, variables=v, feature_dim=2048, name="resnet50")
    momentum = ModelBundle(
        module=m, variables=jax.tree.map(jnp.copy, v), feature_dim=2048, name="resnet50"
    )
    init_sd = variables_to_torch("resnet50", jax.device_get(online.variables))

    sampler = PKBatchSampler(
        splits["train"], splits["train"].pids, P=P, K=K,
        kind_of_transform=kind_of_transform,
        turbulence_dir=turb if kind_of_transform == 1 else None, seed=SEED,
    )
    tr = Trainer(
        online, momentum, sampler, img_size=IMG, num_epochs=TOTAL_EPOCHS,
        base_lr=LR, weight_decay=WD, tau=TAU, beta=BETA, lambda_proxy=LAMBDA_PROXY,
        compute_dtype=jnp.float32, extractor_batch=64,
    )

    rec = {"epochs": []}
    cur: dict = {}

    # --- recording hooks (observation only; the real code paths run) ---
    orig_extract = tr.extractor.extract

    def extract_rec(*a, **kw):
        feats = orig_extract(*a, **kw)
        cur.setdefault("extract_feats", []).append(np.asarray(feats))
        return feats

    tr.extractor.extract = extract_rec

    orig_select = proxies_mod.select_proxies_farthest_point

    def select_rec(X, num_proxies, rng):
        idx, max_d = orig_select(X, num_proxies, rng)
        cur.setdefault("proxy_idx", []).append(np.asarray(idx))
        return idx, max_d

    proxies_mod.select_proxies_farthest_point = select_rec

    orig_mine = trainer_mod.mine_proxies_and_centers

    def mine_rec(*a, **kw):
        pset = orig_mine(*a, **kw)
        cur["pset"] = pset
        return pset

    trainer_mod.mine_proxies_and_centers = mine_rec

    orig_step = tr._train_step

    def step_rec(state, images, labels, distortions, mask, camids, centers,
                 proxies, proxy_labels, epoch, key):
        cur.setdefault("batches", []).append(
            dict(
                images=np.asarray(images),
                labels=np.asarray(labels),
                distortions=np.asarray(distortions),
                mask=np.asarray(mask),
            )
        )
        new_state, metrics = orig_step(
            state, images, labels, distortions, mask, camids, centers,
            proxies, proxy_labels, epoch, key,
        )
        cur.setdefault("metrics", []).append(metrics)
        return new_state, metrics

    tr._train_step = step_rec

    try:
        for epoch in range(1, EPOCHS + 1):
            cur.clear()
            tr._rng = _LegacyRng(_epoch_seed(epoch))
            tr.train_epoch(epoch)
            metrics = jax.device_get(cur["metrics"])
            rec["epochs"].append(
                dict(
                    extract_feats=cur["extract_feats"][0],
                    proxy_idx=list(cur["proxy_idx"]),
                    pset=cur["pset"],
                    batches=cur["batches"],
                    center_losses=[float(mt["center_loss"]) for mt in metrics],
                    proxy_losses=[float(mt["proxy_loss"]) for mt in metrics],
                    online_sd=variables_to_torch("resnet50", tr.online_variables()),
                    momentum_sd=variables_to_torch("resnet50", tr.momentum_variables()),
                    adam=_adam_state_to_torch_keys(
                        jax.device_get(tr.state.opt_state),
                        tr.online_variables()["batch_stats"],
                    ),
                )
            )
    finally:
        proxies_mod.select_proxies_farthest_point = orig_select
        trainer_mod.mine_proxies_and_centers = orig_mine

    # final validation with the online model (mainKIT.py:162 evaluates both;
    # one side suffices for the parity claim)
    tr.extractor.extract = orig_extract
    tr.extractor.update_variables(tr.online_variables())
    validator = Validator(img_size=IMG, batch_size=64, max_rank=20)
    cmc, mAP, _ = validator.validate(
        splits["query"], splits["gallery"], tr.extractor, verbose=False
    )
    rec["val_cmc"], rec["val_map"] = np.asarray(cmc), float(mAP)
    rec["init_sd"] = init_sd
    rec["splits"], rec["turb"] = splits, turb
    rec["label_set"] = sampler.label_set.copy()
    rec["kind_of_transform"] = kind_of_transform
    return rec


# --------------------------------------------------------------------------
# Phase B: run the LITERAL reference trainer + validator on the recording
# --------------------------------------------------------------------------


def _run_reference(rec):
    _install_reference_stubs()
    import torch

    import train_encodersKIT as TE
    import getFeatures as GF
    import validateModels as VM
    import Encoders

    splits = rec["splits"]
    label_set = rec["label_set"]  # sorted unique pids (= np.unique order)

    def rows(table):
        return np.array(
            [[str(p), int(pid), int(cam), "person"]
             for p, pid, cam in zip(table.paths, table.pids, table.camids)],
            dtype=object,
        )

    train_rows = rows(splits["train"])
    selected_labels = train_rows[:, 1].astype(np.int64)

    # --- model pair: literal reference wrapper over the trunk mirror, our
    # exported init weights (identical to phase A's) ---
    def load_sd(model, sd):
        missing, unexpected = model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=False
        )
        assert not unexpected, unexpected
        assert all(k.endswith("num_batches_tracked") for k in missing), missing

    def build_model(sd):
        model = Encoders.ResNet50ReID(_build_torch_resnet50_base(torch))
        load_sd(model, sd)
        return model

    model_online = build_model(rec["init_sd"])
    model_momentum = build_model(rec["init_sd"])
    optimizer = torch.optim.Adam(model_online.parameters(), lr=LR, weight_decay=WD)

    def load_adam(adam_rec):
        """Inject our (count, mu, nu) as the torch Adam state (lockstep)."""
        count, mu_sd, nu_sd = adam_rec
        osd = optimizer.state_dict()
        names = [n for n, _ in model_online.named_parameters()]
        osd["state"] = {
            i: {
                "step": torch.tensor(float(count)),
                "exp_avg": torch.from_numpy(np.array(mu_sd[n])),
                "exp_avg_sq": torch.from_numpy(np.array(nu_sd[n])),
            }
            for i, n in enumerate(names)
        }
        optimizer.load_state_dict(osd)

    # --- replay loader: the recorded batches, in order ---
    replay: dict = {"batches": []}

    class ReplaySampler:
        """Stands in for samplePKBatches (the tensors were produced by our
        sampler+augment; see module docstring)."""

        def __init__(self, *a, **kw):
            pass

    class ReplayLoader:
        def __init__(self, dataset, **kw):
            self.batches = list(replay["batches"])

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            for b in self.batches:
                yield b

    # force in-process, ordered extraction (the literal getFeatures code,
    # 0 workers instead of 8)
    real_loader = torch.utils.data.DataLoader

    def dl0(ds, batch_size=1, num_workers=0, pin_memory=False, **kw):
        return real_loader(ds, batch_size=batch_size, num_workers=0, **kw)

    ref_rec: dict = {}

    orig_extract = GF.extractFeatures

    def extract_rec(subset, h, w, model, bs, *a, **kw):
        fvs = orig_extract(subset, h, w, model, bs, *a, **kw)
        ref_rec.setdefault("extract_feats", []).append(fvs.numpy().copy())
        return fvs

    orig_select = TE.selectProxiesByTriagulation

    def select_rec(X, num_proxies=5):
        idx, max_d = orig_select(X, num_proxies=num_proxies)
        ref_rec.setdefault("proxy_idx", []).append(idx.numpy().copy())
        return idx, max_d

    orig_center = TE.BatchWeightedCenterLoss
    orig_proxy = TE.BatchWeightedProxyLoss

    def center_rec(*a, **kw):
        out = orig_center(*a, **kw)
        ref_rec.setdefault("center_losses", []).append(float(out[0].item()))
        return out

    def proxy_rec(*a, **kw):
        out = orig_proxy(*a, **kw)
        ref_rec.setdefault("proxy_losses", []).append(float(out.item()))
        return out

    GF.DataLoader = dl0
    TE.DataLoader = ReplayLoader
    TE.samplePKBatches = ReplaySampler
    TE.extractFeatures = extract_rec
    TE.selectProxiesByTriagulation = select_rec
    TE.BatchWeightedCenterLoss = center_rec
    TE.BatchWeightedProxyLoss = proxy_rec
    TE.tqdm = lambda x: x

    trainer_obj = TE.trainer(
        dataset="Synthetic",
        selected_images=train_rows,
        model_name="resnet50",
        labels_dict={l: i for i, l in enumerate(label_set)},
        img_height=IMG[0],
        img_width=IMG[1],
        turbulance_dir_path=rec["turb"],
        # the CL config (log_CL_training_Market.txt): single clean slot per
        # sample, distortion 0 (train_encodersKIT.py:350-360);
        # is_clean_training itself is stored-but-dead upstream (losses.py:54
        # commented), so kind_of_transform carries the whole mode switch
        is_clean_training=rec["kind_of_transform"] == 0,
        kind_of_transform=rec["kind_of_transform"],
        optimizer=optimizer,
        P=P,
        K=K,
        tau=TAU,
        beta=BETA,
        lambda_proxy=LAMBDA_PROXY,
        number_of_epoches=TOTAL_EPOCHS,
        model_online=model_online,
        model_momentum=model_momentum,
        gpu_indexes=[0],
        version="oracle",
    )

    epochs_out = []
    try:
        for epoch in range(1, EPOCHS + 1):
            ours = rec["epochs"][epoch - 1]
            if epoch > 1:
                # lockstep resync to OUR epoch-start state (see docstring)
                prev = rec["epochs"][epoch - 2]
                load_sd(model_online, prev["online_sd"])
                load_sd(model_momentum, prev["momentum_sd"])
                load_adam(prev["adam"])
            # batch tensors: identical to what our train step consumed
            # (labels mapped back from dense class index to raw pid,
            # matching the reference's label space)
            replay["batches"] = [
                [(
                    torch.from_numpy(b["images"].transpose(0, 3, 1, 2).copy()),
                    torch.from_numpy(label_set[b["labels"]].astype(np.float32)),
                    b["distortions"].astype(np.int64),
                )]
                for b in ours["batches"]
            ]
            ref_rec.clear()
            np.random.seed(_epoch_seed(epoch))  # aligns the mining seed draws
            trainer_obj.train(train_rows, selected_labels, 1, epoch)
            epochs_out.append(
                dict(
                    extract_feats=ref_rec["extract_feats"][0],
                    proxy_idx=list(ref_rec["proxy_idx"]),
                    center_losses=list(ref_rec["center_losses"]),
                    proxy_losses=list(ref_rec["proxy_losses"]),
                    online_sd={k: v.detach().numpy().copy()
                               for k, v in model_online.state_dict().items()},
                    momentum_sd={k: v.detach().numpy().copy()
                                 for k, v in model_momentum.state_dict().items()},
                )
            )
        # literal reference validation (validateModels.py:35-76), lockstep:
        # on OUR final online weights, so metric parity isolates the eval
        # composition. Inside the DataLoader patch (in-process, 0 workers;
        # fork from the multithreaded JAX test process deadlocks).
        load_sd(model_online, rec["epochs"][-1]["online_sd"])
        vm = VM.validateModels()
        vm.setParameters(IMG[0], IMG[1], False, 0)
        cmc, mAP, _ = vm.validate(
            rows(splits["query"]), rows(splits["gallery"]), model_online
        )
    finally:
        GF.DataLoader = real_loader
        TE.DataLoader = real_loader
        TE.extractFeatures = orig_extract
        TE.selectProxiesByTriagulation = orig_select
        TE.BatchWeightedCenterLoss = orig_center
        TE.BatchWeightedProxyLoss = orig_proxy

    return {"epochs": epochs_out, "val_cmc": np.asarray(cmc), "val_map": float(mAP)}


@pytest.fixture(scope="module", params=[1, 0], ids=["at", "clean"])
def oracle(request, tmp_path_factory):
    """Both reference training configs are lockstep-verified: the AT config
    (kind_of_transform=1, paired [clean, distorted] slots —
    log_AT_training_Market.txt) and the CL config (kind_of_transform=0,
    clean-only slots — log_CL_training_Market.txt; VERDICT r4 item 5)."""
    kot = request.param
    root = str(tmp_path_factory.mktemp(f"oracle_kot{kot}"))
    ours = _run_ours(root, kind_of_transform=kot)
    theirs = _run_reference(ours)
    return ours, theirs


# --------------------------------------------------------------------------
# assertions
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_extraction_features_match(oracle):
    """Eval-mode composed forward over the whole train set, per epoch — at
    epoch start both sides hold identical weights (lockstep), so this is
    pure forward-path + preprocessing parity."""
    ours, theirs = oracle
    for e in range(EPOCHS):
        a = ours["epochs"][e]["extract_feats"]
        b = theirs["epochs"][e]["extract_feats"]
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3,
                                   err_msg=f"epoch {e + 1}")


@pytest.mark.slow
def test_proxy_mining_matches(oracle):
    """Farthest-point proxy indices per class per epoch — including the
    random seed sample (train_encodersKIT.py:258) via the aligned stream."""
    ours, theirs = oracle
    for e in range(EPOCHS):
        a, b = ours["epochs"][e]["proxy_idx"], theirs["epochs"][e]["proxy_idx"]
        assert len(a) == len(b)
        for c, (ia, ib) in enumerate(zip(a, b)):
            np.testing.assert_array_equal(ia, ib, err_msg=f"epoch {e + 1} class {c}")


@pytest.mark.slow
def test_per_batch_loss_traces_match(oracle):
    """Center + proxy loss, every batch of every epoch
    (train_encodersKIT.py:200-208)."""
    ours, theirs = oracle
    for e in range(EPOCHS):
        np.testing.assert_allclose(
            ours["epochs"][e]["center_losses"], theirs["epochs"][e]["center_losses"],
            rtol=5e-3, atol=5e-4, err_msg=f"center losses, epoch {e + 1}",
        )
        np.testing.assert_allclose(
            ours["epochs"][e]["proxy_losses"], theirs["epochs"][e]["proxy_losses"],
            rtol=5e-3, atol=5e-4, err_msg=f"proxy losses, epoch {e + 1}",
        )


def _assert_sd_close(mine, ref_sd, max_tol, label, q50_tol=1e-6, flip_frac=0.25):
    """Distribution bounds over a SINGLE-step comparison (see module
    docstring). Measured signature of a correct step: the typical weight
    tracks at fp noise (q50 ≈ 1e-8) while a sizeable population (~11% here)
    sits at exactly ±lr flip scale — weights whose effective gradient
    ``g + wd·p`` is below cross-framework conv-backward noise, whose Adam
    step direction is genuinely chance. A composition bug (wrong lr/wd,
    BN-mode flip, EMA order, optimizer semantics) moves the BULK of
    weights: q50 jumps from fp noise to the lr scale and fails loudly."""
    diffs = []
    for k, v in ref_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        diffs.append(np.abs(np.asarray(mine[k], np.float64) - np.asarray(v, np.float64)).ravel())
    d = np.concatenate(diffs)
    assert d.size > 1_000_000  # the full resnet50 state dict was compared
    q50 = float(np.quantile(d, 0.50))
    frac = float((d > 1e-4).mean())
    mx = float(d.max())
    print(f"[oracle] {label}: q50={q50:.2e} q90={np.quantile(d, 0.90):.2e} "
          f"frac>1e-4={frac:.3%} max={mx:.2e}")
    assert q50 <= q50_tol, f"{label}: q50 {q50:.2e} > {q50_tol:.0e}"
    assert frac <= flip_frac, f"{label}: flip fraction {frac:.3%} > {flip_frac:.0%}"
    assert mx <= max_tol, f"{label}: max {mx:.2e} > {max_tol:.0e}"


@pytest.mark.slow
def test_weights_match_per_epoch(oracle):
    """Online (Adam step composition) and momentum (EMA composition) weights,
    including BN running stats (train_encodersKIT.py:214-226). Lockstep:
    each epoch starts from identical state, so bounds are per-epoch."""
    ours, theirs = oracle
    steps = len(ours["epochs"][0]["batches"])
    assert steps == 1  # single-step lockstep (P = all classes)
    max_tol = 3.0 * LR
    for e in range(EPOCHS):
        # Epoch 1 consumes identical centers/proxies-from-identical-features
        # on both sides → the bulk tracks at raw fp noise (measured 7e-9).
        # Later epochs mine from each side's own extraction; those ~1e-5
        # feature deltas amplify through the tau=0.1 softmax backprop to a
        # measured q50 of 4e-6 (epoch 2) / 1.3e-5 (epoch 3) — still ~70x
        # under any composition-bug scale (which moves q50 to ~lr).
        q50_tol = 1e-7 if e == 0 else 5e-5
        _assert_sd_close(
            ours["epochs"][e]["online_sd"], theirs["epochs"][e]["online_sd"],
            max_tol, f"online, epoch {e + 1}", q50_tol=q50_tol,
        )
        _assert_sd_close(
            ours["epochs"][e]["momentum_sd"], theirs["epochs"][e]["momentum_sd"],
            max_tol, f"momentum, epoch {e + 1}", q50_tol=q50_tol,
        )


@pytest.mark.slow
def test_final_validation_matches(oracle):
    """Literal validateModels.validate vs our Validator, both on OUR final
    online weights (lockstep) — eval-composition parity is exact."""
    ours, theirs = oracle
    np.testing.assert_allclose(
        ours["val_cmc"][:20], theirs["val_cmc"][:20], atol=1e-6,
    )
    assert ours["val_map"] == pytest.approx(theirs["val_map"], abs=1e-4)


@pytest.mark.slow
def test_oracle_batches_were_full(oracle):
    """Sanity: no padding slots, so the reference (which has no masking) saw
    exactly what our losses saw."""
    ours, _ = oracle
    per_slot = 2 if ours["kind_of_transform"] == 1 else 1
    for e in ours["epochs"]:
        for b in e["batches"]:
            assert b["mask"].all()
            assert b["images"].shape[0] == P * K * per_slot
