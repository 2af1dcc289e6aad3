"""Shared factory for the rebuttal complex-dataset drivers.

Reference: src/bloodmnist.py / src/PneumoniaMNIST.py / src/fruit_360.py /
src/logo2kplus.py — diff-verified clones differing only in dataset default,
label list, and save paths; all augment the per-label training set to 100
samples with random +-15 degree rotations (src/bloodmnist.py:335-342,
:413-460).
"""

from __future__ import annotations

import sys

from . import common

def _default_models(img_size: int):
    pixels = str(img_size * img_size)
    return [
        ["QDenseUndirected_old_noise", "60", str(img_size)],
        ["QIDDM_LL_noise", pixels, "6", "14", "2"],
    ]


def make_main(description, *, default_data, default_img_size, labels,
              save_prefix, n_classes, default_models=None,
              augment_to: int = 100):
    def parse_args(argv):
        p = common.build_parser(
            description,
            default_models=default_models or _default_models(default_img_size),
            default_data=default_data, default_img_size=default_img_size,
            default_label=labels[0], default_ds_size=5, default_epochs=15,
            default_batch_size=1, default_tau=10,
            default_save_path=save_prefix, default_load_path=save_prefix)
        p.set_defaults(n_classes=n_classes)
        return p.parse_args(argv)

    def main(argv=None):
        common.initial_log()
        args = parse_args(sys.argv[1:] if argv is None else argv)
        return common.run_labels(args, labels=labels, augment_to=augment_to,
                                 tau_test=5,
                                 protocol=common.REBUTTAL_PROTOCOL)

    return parse_args, main
