"""timm.scheduler.create_scheduler shim: per-epoch cosine LR with linear
warmup and optional multiplicative noise, faithful to timm's
CosineLRScheduler as the reference drives it (step(epoch) at the END of
each epoch, classification/train.py:287; construction initializes the LR
to warmup_lr_init when warmup is configured).
"""
import math

import numpy as np


class CosineLRScheduler:
    def __init__(
        self,
        optimizer,
        t_initial,
        lr_min,
        warmup_t,
        warmup_lr_init,
        noise_range_t=None,
        noise_pct=0.67,
        noise_std=1.0,
        noise_seed=42,
    ):
        self.optimizer = optimizer
        self.base_values = [g["lr"] for g in optimizer.param_groups]
        self.t_initial = t_initial
        self.lr_min = lr_min
        self.warmup_t = warmup_t
        self.warmup_lr_init = warmup_lr_init
        self.noise_range_t = noise_range_t
        self.noise_pct = noise_pct
        self.noise_std = noise_std
        self.noise_seed = noise_seed
        if self.warmup_t:
            self.update_groups([warmup_lr_init] * len(self.base_values))

    def _get_lr(self, t):
        values = []
        for base in self.base_values:
            if self.warmup_t and t < self.warmup_t:
                v = self.warmup_lr_init + t * (
                    (base - self.warmup_lr_init) / self.warmup_t
                )
            elif t < self.t_initial:
                tt = t - self.warmup_t
                total = max(self.t_initial - self.warmup_t, 1)
                v = self.lr_min + 0.5 * (base - self.lr_min) * (
                    1 + math.cos(math.pi * tt / total)
                )
            else:
                v = self.lr_min
            values.append(v)
        return values

    def _add_noise(self, values, t):
        if self.noise_range_t is None:
            return values
        if isinstance(self.noise_range_t, (list, tuple)):
            active = self.noise_range_t[0] <= t < self.noise_range_t[1]
        else:
            active = t >= self.noise_range_t
        if not active:
            return values
        rng = np.random.RandomState(self.noise_seed + t)
        while True:
            noise = rng.normal(0, self.noise_std)
            if abs(noise) < self.noise_pct:
                break
        return [v + v * noise for v in values]

    def get_epoch_values(self, epoch):
        return self._add_noise(self._get_lr(epoch), epoch)

    def update_groups(self, values):
        for group, value in zip(self.optimizer.param_groups, values):
            group["lr"] = value

    def step(self, epoch, metric=None):
        self.update_groups(self.get_epoch_values(epoch))

    def state_dict(self):
        return {
            k: v for k, v in self.__dict__.items() if k != "optimizer"
        }

    def load_state_dict(self, state):
        self.__dict__.update(state)


def create_scheduler(args, optimizer):
    if args.sched != "cosine":
        raise NotImplementedError(f"scheduler {args.sched}")
    noise_range = None
    if getattr(args, "lr_noise", None) is not None:
        if isinstance(args.lr_noise, (list, tuple)):
            noise_range = [n * args.epochs for n in args.lr_noise]
            if len(noise_range) == 1:
                noise_range = noise_range[0]
        else:
            noise_range = args.lr_noise * args.epochs
    scheduler = CosineLRScheduler(
        optimizer,
        t_initial=args.epochs,
        lr_min=args.min_lr,
        warmup_t=args.warmup_epochs,
        warmup_lr_init=args.warmup_lr,
        noise_range_t=noise_range,
        noise_pct=getattr(args, "lr_noise_pct", 0.67) or 0.67,
        noise_std=getattr(args, "lr_noise_std", 1.0) or 1.0,
        noise_seed=42,
    )
    num_epochs = args.epochs + getattr(args, "cooldown_epochs", 0)
    return scheduler, num_epochs
