"""UnCRtainTS-TPU: a TPU-native (JAX/XLA/Flax/pjit/Pallas) framework for
multi-temporal cloud removal in Sentinel-2 satellite image time series with
multivariate aleatoric uncertainty prediction.

Re-designed from scratch for TPU hardware with the capability surface of the
PyTorch reference (PatrickTUM/UnCRtainTS):

- dataset loaders for SEN12MS-CR-TS (multi-temporal) and SEN12MS-CR
  (mono-temporal), cloud/shadow detection (threshold-based, on-device)
- model zoo: UnCRtainTS (L-TAE temporal attention + MBConv/residual blocks),
  U-TAE, U-Net, UNet3D, recurrent U-Nets (ConvLSTM/ConvGRU), FPN+ConvLSTM
- Gaussian NLL losses (univariate & multivariate), train/val/test engine with
  calibration metrics (UCE/AUCE/ECE discard curves), checkpoint/resume,
  prediction export, offline deep-ensemble fusion

TPU-first design notes (vs. the CUDA/torch reference):
- NHWC tensor layout ([B, T, H, W, C]) -- native for TPU convolutions
- single jitted train step; data parallelism via jax.sharding.Mesh + pjit
  (gradient reduction compiles to ICI collectives, no NCCL analogue needed)
- masked dense compute for temporal padding (static shapes; the reference's
  dynamic pad-frame filtering does not map to XLA)
- closed-form elementwise multivariate NLL (the reference's double
  torch.vmap over H,W with bmm/diag_embed is unnecessary on TPU)
"""

__version__ = "0.1.0"

S1_BANDS = 2
S2_BANDS = 13
