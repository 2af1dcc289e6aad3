"""Logo-2K+ rebuttal driver (reference src/logo2kplus.py).

Label note: the reference release is internally inconsistent here — its
driver loops ``for label in [0,1,2]`` (src/logo2kplus.py:359) but every
shipped Logo-2K+ artifact (results_rebuttal_complex_dataset/logo2kplus.zip:
``QIDDM_PL_noise=8_L=6_N=2_{1,4,5}.pt`` + per-class image dirs) carries
labels 1/4/5, and the ``logo2kplus_28x28`` loader built from those shipped
PNGs (tools/extract_reference_data.py) does too. This driver follows the
shipped artifacts so the defaults actually match the data.
"""

from .rebuttal_common import make_main

parse_args, main = make_main(
    "QDDM on Logo-2K+", default_data="logo2kplus_28x28",
    default_img_size=28, labels=[1, 4, 5], save_prefix="results/for_logo/",
    n_classes=10)

if __name__ == "__main__":
    main()
