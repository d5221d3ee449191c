from conzic_tpu.engine.gibbs import EngineSpec, run_generation
from conzic_tpu.engine.orders import Schedule, build_schedule
from conzic_tpu.engine.primitives import generate_step
from conzic_tpu.engine.sampler import (
    Captioner,
    GenerationResult,
    control_generate_caption,
    generate_caption,
)

__all__ = [
    "EngineSpec",
    "run_generation",
    "Schedule",
    "build_schedule",
    "Captioner",
    "GenerationResult",
    "generate_step",
    "generate_caption",
    "control_generate_caption",
]
