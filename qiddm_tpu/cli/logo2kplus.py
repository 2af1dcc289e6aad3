"""Logo-2K+ rebuttal driver (reference src/logo2kplus.py)."""

from .rebuttal_common import make_main

parse_args, main = make_main(
    "QDDM on Logo-2K+", default_data="logo2kplus_28x28",
    default_img_size=28, labels=[0, 1, 2], save_prefix="results/for_logo/",
    n_classes=10)

if __name__ == "__main__":
    main()
