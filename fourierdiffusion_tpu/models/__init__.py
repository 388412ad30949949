from fourierdiffusion_tpu.models.score_models import (
    MODEL_REGISTRY,
    ScoreLSTM,
    ScoreMLP,
    ScoreModelConfig,
    ScoreTransformer,
)

__all__ = [
    "MODEL_REGISTRY",
    "ScoreLSTM",
    "ScoreMLP",
    "ScoreModelConfig",
    "ScoreTransformer",
]
