"""malio_tpu: TPU-native multi-LiDAR inertial odometry (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of MA-LIO (minwoo0611/MA-LIO,
RA-L'23) as an idiomatic JAX framework: functional iterated error-state
Kalman filtering over a padded multi-LiDAR state manifold, SE(3) B-spline
continuous-time deskew, Barfoot point-wise uncertainty propagation, an
HBM-resident voxel-hash map with batched k-NN, and sharded multi-chip
execution via jax.sharding.
"""

__version__ = "0.1.0"
