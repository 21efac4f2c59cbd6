"""One typed configuration covering model, data, sampler, losses, schedule,
eval — replacing the reference's per-script argparse blocks
(``Person-ReID/mainKIT.py:316-344``, ``evaluate.py:630-677``) and the absent
yacs ``config.py`` it imports (``evaluate.py:46``, noted missing in
SURVEY.md §2.1 #10). Defaults mirror the reference's training defaults.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    # model
    model_name: str = "resnet50"
    img_height: int = 256                 # mainKIT.py:320
    img_width: int = 128                  # mainKIT.py:321
    compute_dtype: str = "bfloat16"
    model_path: Optional[str] = None      # pretrained weights (.npz or torch)

    # data
    dataset: str = "Market"
    data_root: Optional[str] = None
    turbulence_dir: Optional[str] = None  # mainKIT.py:336
    kind_of_transform: int = 1            # 1 = AT-paired, 0 = clean (mainKIT.py:340)
    is_clean_training: bool = False       # mainKIT.py:337

    # classifier / margin head (TransReID-JPM training,
    # make_models.py:258-304; -1 = one class per training identity)
    num_classes: int = 0
    id_loss_type: str = "softmax"         # softmax | arcface | cosface |
                                          # amsoftmax | circle
    margin_s: float | None = None         # cfg.SOLVER.COSINE_SCALE
    margin_m: float | None = None         # cfg.SOLVER.COSINE_MARGIN
    sie_cameras: int = 0                  # SIE camera table (cfg.MODEL.
                                          # SIE_CAMERA); -1 = #train cameras
    sie_coef: float = 1.5                 # SIE scale (sie_xishu factory
                                          # default, vit_pytorch.py:453,461;
                                          # cfg.MODEL.SIE_COE)
    remat: str = "none"                   # transformer activation-checkpoint
                                          # policy (models/vit.REMAT_MODES);
                                          # 'none' measured fastest at the
                                          # protocol batch (XLA auto-remat
                                          # wins — BENCH.md); opt-in memory
                                          # knob for bigger batches/models

    # sampler
    P: int = 16                           # mainKIT.py:326
    K: int = 12                           # mainKIT.py:327

    # optimization (mainKIT.py:324-332 defaults)
    lr: float = 3.5e-4
    weight_decay: float = 5e-4
    tau: float = 0.05
    beta: float = 0.999
    lambda_proxy: float = 0.4
    num_epochs: int = 250
    num_proxies: int = 5                  # train_encodersKIT.py:61
    seed: int = 12                        # mainKIT.py:48-50

    # eval / checkpointing
    eval_freq: int = 5                    # mainKIT.py:344 (no default upstream)
    ckpt_freq: int = 1                    # crash-resume channel: save the full
                                          # TrainState+RNG every N epochs under
                                          # save_dir/latest (0 disables; the
                                          # reference persists best-metric
                                          # state_dicts only, mainKIT.py:165-170)
    save_dir: str = "checkpoints"
    metrics_dir: str = "metrics"
    version: str = "v0"

    # runtime
    extractor_batch: int = 512
    decode_workers: int = 16
    # int8 PTQ for the per-epoch mining re-embedding only (beyond-reference;
    # VERDICT r3 item 8) — eval extraction stays full-precision
    mining_quantize: str | None = None
    mining_calib_batches: int = 1
    grad_accum: int = 1                   # microbatches per optimizer step
                                          # (grads averaged, one Adam + EMA);
                                          # memory knob for >HBM batches —
                                          # see Trainer(grad_accum=...)

    @property
    def img_size(self) -> Tuple[int, int]:
        return (self.img_height, self.img_width)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "TrainConfig":
        return TrainConfig(**json.loads(s))


@dataclasses.dataclass
class EvalConfig:
    model_name: str = "resnet50"
    model_path: Optional[str] = None
    model_path_second: Optional[str] = None   # ensemble / fusion second model
    img_height: int = 256
    img_width: int = 128
    compute_dtype: str = "bfloat16"
    dataset: str = "Market"
    data_root: Optional[str] = None
    batch_size: int = 512
    turbulence_dir: Optional[str] = None
    turb_strength: Optional[int] = None
    multiple_output: bool = False
    roc_version: Optional[str] = None

    @property
    def img_size(self) -> Tuple[int, int]:
        return (self.img_height, self.img_width)
