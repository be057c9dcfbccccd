"""Feature-importance interpretability (Integrated Gradients in pure JAX)."""

from mmer_tpu.interpret.ig import (aggregate_importances,  # noqa: F401
                                   compute_attributions, integrated_gradients,
                                   interpret_test_set)
