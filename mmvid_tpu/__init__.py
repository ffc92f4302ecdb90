"""mmvid_tpu — TPU-native (JAX/XLA/Pallas/pjit) multimodal video synthesis framework.

A from-scratch rebuild of the capabilities of snap-research/MMVID ("Show Me What
and Tell Me How: Video Synthesis via Multimodal Conditioning", CVPR 2022):

* VQGAN image tokenizer (taming-transformers VQModel architecture) in Flax/NHWC
  with Pallas codebook-lookup kernels   -> :mod:`mmvid_tpu.models.vqgan`
* CLIP-architecture transformer backbone with causal / mask_prev attention
  masks                                  -> :mod:`mmvid_tpu.models.clip`
* BERT-style non-autoregressive multimodal transformer with MSM/REL/VID
  training losses and batched mask-predict (PNAG) sampling
                                         -> :mod:`mmvid_tpu.models.bert`
* ART-V autoregressive baseline with a KV-cached sampler
                                         -> :mod:`mmvid_tpu.models.artv`
* SPMD data/tensor-parallel training over a `jax.sharding.Mesh`
                                         -> :mod:`mmvid_tpu.parallel`
* FVD (I3D) / PRD / CLIP-score evaluation stack
                                         -> :mod:`mmvid_tpu.eval`

Reference parity is documented per-module via ``/root/reference`` file:line
citations in docstrings.
"""

__version__ = "0.1.0"
