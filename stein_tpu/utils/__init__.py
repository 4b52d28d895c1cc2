from .ravel import (
    template_unraveler,
    ravel_particles,
    unravel_particles,
    init_particles,
)

__all__ = [
    "template_unraveler",
    "ravel_particles",
    "unravel_particles",
    "init_particles",
]
