"""AlignQ-TPU: a TPU-native quantized training & inference framework.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of
tinganchen/AlignQ ("AlignQ: Alignment Quantization with ADMM-based
Correlation Preservation", CVPR 2022):

- CDF-alignment fake quantization (weights & activations) with a
  straight-through estimator and the analytic PDF-corrected gradient rule.
- ADMM-based correlation preservation (augmented-Lagrangian trans-loss +
  closed-form z/dual updates).
- Model zoo: PreAct ResNet-20/56 (CIFAR), DenseNet-40, MobileNet-V2,
  ResNet-18/34/50 backbones with DANN / DSAN domain-adaptation heads,
  and the small digit-DANN CNN.
- Baseline quantizers: uniform, DoReFa, LSQ, APoT, LLSQ, BWN/BWNF.
- TPU execution: jit/pjit over `jax.sharding.Mesh`, Pallas fused
  int8 kernels for the inference path, bf16 MXU matmuls for QAT.

The package layout (vs reference layers, see SURVEY.md section 1):
  quant/   -- quantizer math (ref: model/quantization*.py)
  admm/    -- correlation-preservation core (ref: utils/admm.py, optimizer.py)
  nn/      -- quantized flax modules (ref: conv2d_Q_fn et al.)
  models/  -- model zoo (ref: model/*.py across the 12 projects)
  optim/   -- PDF-corrected optimizer chain (ref: utils/optimizer.py)
  train/   -- config, train/eval steps, loops, checkpointing (ref: main.py)
  data/    -- input pipelines (ref: data/*.py)
  dist/    -- mesh/sharding/collectives (no reference equivalent; TPU-native)
  kernels/ -- Pallas TPU kernels (no reference equivalent; TPU-native)
"""

__version__ = "0.1.0"
