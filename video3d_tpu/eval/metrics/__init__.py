from video3d_tpu.eval.metrics.bleu import Bleu
from video3d_tpu.eval.metrics.cider import Cider
from video3d_tpu.eval.metrics.rouge import Rouge
from video3d_tpu.eval.metrics.meteor import Meteor
from video3d_tpu.eval.metrics.meteor15 import Meteor15
