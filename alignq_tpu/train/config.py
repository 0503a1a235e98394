"""Typed training configuration.

Replaces the reference's per-project argparse singletons
(/root/reference/cdf_alignment/resnet-20-cifar-10/utils/options.py:31-90 and
the DA variants) — the `args` module-global imported deep inside model code
(quantization.py:10) is an anti-pattern we deliberately do not port
(SURVEY.md section 5 config entry). Defaults mirror options.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # model (options.py:31-53)
    target_model: str = "resnet20_quant"
    method: str = "ours"  # ours | uniform | dorefa | lsq | apot | llsq | bwn | bwnf | uniform_admm | fp
    bitW: int = 8
    abitW: int = 8
    act_range: float = 2.0
    variant: str = "b"
    num_classes: int = 10

    # optimization (options.py:54-89)
    lr: float = 0.04
    momentum: float = 0.9
    weight_decay: float = 1e-4
    num_epochs: int = 200
    train_batch_size: int = 128
    eval_batch_size: int = 100
    lr_decay_steps: Sequence[int] = (80, 120)
    lr_gamma: float = 0.1
    warmup_epochs: float = 0.0  # linear LR warmup (not in reference; see schedules.py)
    lam: float = 1.0
    lam2: float = 4.0

    # AlignQ specifics
    admm: bool = False
    # deploy-exact QAT: model the INT graph's stem/residual requant sites in
    # training (resnet_cifar.py PreActResNet.deploy_exact; mobilenetv2.py
    # stem + signed block edges; densenet.py stem only); pair with
    # variant='int8'
    deploy_exact: bool = False
    # int8 residual stream (requires deploy_exact): train the INT graph's
    # requantized-stream edge semantics so deployment can store the stream
    # as int8 codes — half the stream HBM bytes
    # (resnet_cifar.py PreActResNet.stream_int8; deploy with
    # resnet20_int8_forward(stream='int8'))
    stream_int8: bool = False
    # int8 STAGE BUFFER (DenseNet; requires deploy_exact): train the
    # calibrated per-channel requant sites the int8-stage-buffer deployment
    # graph applies (models/densenet.py stage_int8;
    # kernels/infer_densenet.py densenet40_int8_forward(stage_int8=True))
    stage_int8: bool = False
    # StageRequant calibrator for stage_int8 ('max' | 'ema' | 'ema_p999' —
    # nn/layers.py StageRequant). Default 'ema' by the measured A/B
    # (tools/stage_calib_ab.py, ARCHITECTURE.md stage-calibration table):
    # under an injected early-training activation spike the monotone max's
    # scale inflates permanently (up to 2.12x) and the trained net lands
    # 31.6 pts lower than the EMA run; the EMA also uses the code range
    # better on clean runs (final amax ~0.68x the running max). 'max'
    # remains the deterministic-upper-bound option.
    stage_calib: str = "ema"
    admm_mu: float = 0.2
    admm_rho: float = 0.3
    # act-site CDF evaluation: 'erf' (reference-exact) or 'poly' (the
    # ERF_SQRT2_POLY grid, quant/cdf.py — TPU fast path; deploy with the
    # matching act_impl='poly' INT graph)
    cdf_impl: str = "erf"
    # which conv kernels get the PDF-corrected gradient; the stem is excluded
    # for ResNet (main.py:300 idx[1:]) but included for DenseNet/MobileNet
    correction_exclude: Sequence[str] = ("conv0",)
    # False = plain SGD(momentum, wd) for all params. This is ALSO the
    # committed reference's effective behavior: its SGD.step assigns the
    # corrected gradient to p.grad but updates p.data with the uncorrected
    # momentum buffer (optimizer.py:249-251; SURVEY.md 2.4.7). True (default)
    # applies the paper's intended correction (optim/correction.py).
    use_correction: bool = True
    # cross-device corr mode — SURVEY.md section 5. 'gather' (default):
    # exact global-batch matrix via all_gather, the reference's semantics.
    # 'local': per-shard block-diagonal matrices with per-shard duals, zero
    # corr-path communication. Measured A/B (CORR_MODE_AB_r4.json): equal
    # final/best top-1, but 'local' converges ~4 epochs slower (B_local
    # matrices are a weaker alignment signal) — pick it only when the
    # per-site all-gather is the measured interconnect bottleneck.
    corr_mode: str = "gather"
    # DP gradient all-reduce wire format: 'f32' | 'bf16' | 'int8_gather'
    # (dist/collectives.py)
    grad_compression: str = "f32"

    # data
    dataset: str = "cifar10"
    data_dir: str = "/root/data"
    num_workers: int = 2

    # run control (options.py:40-53)
    job_dir: str = "/tmp/alignq_job"
    seed: int = 0
    print_freq: int = 100
    eval_freq_epochs: int = 1
    # keep only the single best-top1 checkpoint (reference model_best.pt,
    # utils/common.py:29-61; the svhn driver keeps best only)
    best_only_checkpoint: bool = False

    # TPU execution
    mxu_bf16: bool = False  # cast conv operands to bf16 for full MXU rate
    mesh_shape: Sequence[int] = (1,)
    mesh_axes: Sequence[str] = ("data",)

    def model_kwargs(self) -> dict:
        return dict(
            w_bit=self.bitW,
            a_bit=self.abitW,
            method=self.method,
            variant=self.variant,
            cdf_impl=self.cdf_impl,
            act_range=self.act_range,
            admm=self.admm,
            num_classes=self.num_classes,
        )
