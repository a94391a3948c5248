"""mdgat_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud keypoint matching framework.

Re-implements the full capability surface of MDGAT-matcher (RAL 2021,
"Keypoint Matching for Point Cloud Registration Using Multiplex Dynamic Graph
Attention Networks") as an idiomatic JAX framework:

- ``ops``       pure-function kernel library (attention, dynamic top-k
                attention, log-domain Sinkhorn optimal transport, losses,
                match decision, rigid-registration geometry) with Pallas
                TPU kernels for the hot paths.
- ``models``    MDGAT and the SuperGlue baseline as functional models over
                explicit parameter pytrees.
- ``data``      KITTI keypoint/pose pipeline plus a synthetic generator,
                producing the same batch-dict API as the reference
                (``load_data.py:299-321``).
- ``parallel``  device-mesh sharding (data / sequence parallel) via
                ``jax.sharding`` — replaces torch ``DataParallel``.
- ``train``     jitted train/eval steps with optax, BN state handling,
                checkpointing (native + ``.pth`` conversion).
- ``eval``      the reference metric protocols (``test.py``,
                ``test_registration_metric.py``).
- ``api``       high-level library entry (``from mdgat_tpu.api import
                Matcher``): checkpoint in, matches/pose out.
"""

__version__ = "0.1.0"
