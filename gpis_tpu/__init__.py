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
    "fit",
    "fit_inference",
    "predict",
    "update",
    "fit_with_normals",
    "fit_experts",
    "fit_sharded",
    "fit_sharded_joint",
    "optimize_sharded",
    "optimize_ooc",
    "optimize_ooc_joint",
    "ooc_fit",
    "ooc_fit_joint",
    "ooc_update",
    "kernel_params",
    "register_kernel",
    "build_training_set",
    "load_cloud",
]
__version__ = "0.1.0"


_LAZY = {
    "ObjectModelSession": ("gpis_tpu.api.session", "ObjectModelSession"),
    "fit": ("gpis_tpu.gp.regression", "fit"),
    "fit_inference": ("gpis_tpu.gp.regression", "fit_inference"),
    "predict": ("gpis_tpu.gp.regression", "predict"),
    "update": ("gpis_tpu.gp.regression", "update"),
    "fit_with_normals": ("gpis_tpu.gp.derivative", "fit_with_normals"),
    "fit_experts": ("gpis_tpu.gp.experts", "fit_experts"),
    "fit_sharded": ("gpis_tpu.gp.sharded_model", "fit_sharded"),
    "fit_sharded_joint": ("gpis_tpu.gp.sharded_joint", "fit_sharded_joint"),
    "optimize_sharded": ("gpis_tpu.gp.sharded_hyperopt", "optimize_sharded"),
    "optimize_ooc": ("gpis_tpu.gp.ooc_hyperopt", "optimize_ooc"),
    "optimize_ooc_joint": ("gpis_tpu.gp.ooc_hyperopt", "optimize_ooc_joint"),
    "ooc_fit": ("gpis_tpu.linalg.outofcore", "ooc_fit"),
    "ooc_fit_joint": ("gpis_tpu.linalg.outofcore", "ooc_fit_joint"),
    "ooc_update": ("gpis_tpu.linalg.outofcore", "ooc_update"),
    "kernel_params": ("gpis_tpu.kernels.functions", "kernel_params"),
    "register_kernel": ("gpis_tpu.kernels.functions", "register_kernel"),
    "build_training_set": ("gpis_tpu.data.gpis", "build_training_set"),
    "load_cloud": ("gpis_tpu.data.io", "load_cloud"),
}


def __getattr__(name):
    # Lazy imports: keep `import gpis_tpu` cheap and jax-import-order safe
    # (tests must set platform config before jax initializes a backend).
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
