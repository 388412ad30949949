from fourierdiffusion_tpu.ops.fourier import (
    dft,
    idft,
    localization_metrics,
    n_real_components,
    smooth_frequency,
    spectral_density,
)

__all__ = [
    "dft",
    "idft",
    "localization_metrics",
    "n_real_components",
    "smooth_frequency",
    "spectral_density",
]
