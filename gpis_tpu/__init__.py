"""gpis-tpu: TPU-native Gaussian-process implicit-surface object modelling.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`pacman-project/gaussian-object-modelling` (see SURVEY.md for the full
reference analysis; the reference mount was empty at survey time — SURVEY.md
§0 — so reference citations are to SURVEY.md sections rather than file:line).

Public surface (mirrors the reference's service API via
`gpis_tpu.api.session.ObjectModelSession`):

    from gpis_tpu import ObjectModelSession, ModelConfig
    sess = ObjectModelSession(ModelConfig(kernel="rbf"))
    sess.start(points)                  # reference: start_process service
    path = sess.next_best_path()        # reference: get_next_best_path
    sess.update(touch_points)           # reference: update service
"""

from gpis_tpu.config import ExploreConfig, MeshConfig, ModelConfig, load_config

__all__ = [
    "ModelConfig",
    "ExploreConfig",
    "MeshConfig",
    "load_config",
    "ObjectModelSession",
]
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import: keep `import gpis_tpu` cheap and jax-import-order safe
    # (tests must set platform env vars before jax initializes).
    if name == "ObjectModelSession":
        from gpis_tpu.api.session import ObjectModelSession

        return ObjectModelSession
    raise AttributeError(name)
