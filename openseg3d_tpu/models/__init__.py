from .losses import (ce_loss, ohem_ce_loss, lovasz_softmax_loss, dice_loss,
                     focal_loss, build_criterion)
from .optim import build_optimizer, build_schedule, warmup_poly_schedule
from .segmentors.common import ModelSpec

__all__ = ['ce_loss', 'ohem_ce_loss', 'lovasz_softmax_loss', 'dice_loss',
           'focal_loss', 'build_criterion', 'build_optimizer', 'build_schedule',
           'warmup_poly_schedule', 'ModelSpec']
