"""qiddm_tpu.nn — the full denoiser zoo behind the reference's public names.

The reference ships no ``nn/__init__.py`` though its drivers import from the
package (reference src/mnist_exm.py:24-25; SURVEY §8.2) — this module is the
aggregating re-export the release implies.
"""

from .core import QDense as QDenseModule  # noqa: F401
from .core import QNNA as QNNAModule  # noqa: F401
from .core import QNNDense as QNNDenseModule  # noqa: F401
from .core import Reupload as ReuploadModule  # noqa: F401
from .qdense import (  # noqa: F401
    QDenseUndirected_old,
    QDenseUndirected_old_noise,
    QIDDM_A_differN_NEW,
    QIDDM_A_differN_basePL,
    QIDDM_A_sameN,
    QIDDM_CL_new,
    QIDDM_CL_old,
    QIDDM_L,
    QIDDM_L_B,
    QIDDM_LL_noise,
    QIDDM_LL_old,
    QIDDM_LL_relu_noise,
    QIDDM_PL,
    QIDDM_PL_noise,
    QIDDM_PL_noise1,
    QIDDM_PL_old,
    QIDDM_PP_noise,
    QIDDM_PP_old,
    QIDDM_bias_false,
    QNN,
    QNN_A,
    QNN_noise,
    differN_new_conv,
    differN_new_pca,
    differN_noise,
    differN_noise_befor,
    differN_old_conv,
    differN_old_pca,
)
from .conv import (  # noqa: F401
    DeepConvDirectedMulti,
    DeepConvDirectedSingle,
    DeepConvUndirected,
)
from .qconv import QConv2d, QConv2dMedium, QConv2dSlow  # noqa: F401
from .shim import DenoiserShim  # noqa: F401
from .unet import (  # noqa: F401
    UnetDirected,
    UnetDirectedS,
    UNetUndirected,
    UNetUndirectedS,
)
from .utils import autocrop, autopad, get_label_embedding  # noqa: F401

# dense.py is byte-identical to qdense.py in the reference (SURVEY §8.1);
# mirror that by aliasing the module namespace.
from . import qdense as dense  # noqa: F401
