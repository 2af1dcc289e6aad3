"""qiddm_tpu.cli — experiment drivers with the reference's CLI surface.

One module per reference script (src/mnist_exm.py, src/fashion_exm.py, ...);
shared logic lives in ``common.py``. Invoke as
``python -m qiddm_tpu.cli.mnist_exm [flags]``.
"""
