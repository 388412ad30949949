"""fourierdiffusion_tpu — TPU-native score-based time-series diffusion.

A JAX/XLA/Pallas re-design of the capabilities of
JonathanCrabbe/FourierDiffusion ("Time Series Diffusion in the
Frequency Domain", arXiv:2402.05933): continuous VP/VE SDE diffusion
over time series in either the time domain or an orthonormal real-DFT
frequency domain, with transformer / MLP / LSTM score networks, a fully
fused ``lax.scan`` reverse-diffusion sampler, device-resident data
pipelines, and sliced/marginal Wasserstein evaluation.
"""

__version__ = "0.1.0"
