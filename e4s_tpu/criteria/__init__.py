from e4s_tpu.criteria.adv_loss import (
    adv_d_loss,
    adv_g_loss,
    d_r1_loss,
    g_path_regularize,
)
from e4s_tpu.criteria.w_norm import w_norm_loss
from e4s_tpu.criteria.id_loss import IDLoss
from e4s_tpu.criteria.parsing_loss import FaceParsingLoss
from e4s_tpu.criteria.style_loss import StyleLoss
