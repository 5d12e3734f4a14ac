"""TPU-native visual-inertial SLAM framework (Rover-SLAM capabilities, JAX/XLA/Pallas)."""
import jax as _jax

__version__ = "0.1.0"

# Geometry/optimization correctness requires true f32 matmuls. On TPU the MXU
# otherwise defaults to bfloat16 inputs, which turns noiseless triangulation into
# ~1 cm error and corrupts Levenberg-Marquardt steps. Neural-network modules opt
# back into fast bf16 explicitly (jax.default_matmul_precision context) where it
# is safe.
_jax.config.update("jax_default_matmul_precision", "highest")
