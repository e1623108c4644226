from senas_tpu.train.loss import build_loss, segmentation_loss
from senas_tpu.train.metrics import SegmentationMetric, AverageMeter, confusion_counts
from senas_tpu.train.optim import build_optimizer, build_scheduler
