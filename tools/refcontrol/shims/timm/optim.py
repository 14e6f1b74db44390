"""timm.optim.create_optimizer shim (timm semantics)."""
import torch


def add_weight_decay(model, weight_decay=1e-5, skip_list=()):
    """timm's parameter split: biases and 1-D params get no weight decay."""
    decay, no_decay = [], []
    for name, param in model.named_parameters():
        if not param.requires_grad:
            continue
        if (
            len(param.shape) == 1
            or name.endswith(".bias")
            or name in skip_list
        ):
            no_decay.append(param)
        else:
            decay.append(param)
    return [
        {"params": no_decay, "weight_decay": 0.0},
        {"params": decay, "weight_decay": weight_decay},
    ]


def create_optimizer(args, model, filter_bias_and_bn=True):
    opt = args.opt.lower()
    weight_decay = args.weight_decay
    if weight_decay and filter_bias_and_bn:
        skip = (
            model.no_weight_decay()
            if hasattr(model, "no_weight_decay")
            else ()
        )
        parameters = add_weight_decay(model, weight_decay, skip)
        weight_decay = 0.0
    else:
        parameters = model.parameters()

    if opt == "adamw":
        return torch.optim.AdamW(
            parameters,
            lr=args.lr,
            weight_decay=weight_decay,
            eps=args.opt_eps,
            betas=args.opt_betas or (0.9, 0.999),
        )
    if opt == "adam":
        return torch.optim.Adam(
            parameters,
            lr=args.lr,
            weight_decay=weight_decay,
            eps=args.opt_eps,
            betas=args.opt_betas or (0.9, 0.999),
        )
    if opt in ("sgd", "momentum", "nesterov"):
        return torch.optim.SGD(
            parameters,
            lr=args.lr,
            momentum=args.momentum,
            weight_decay=weight_decay,
            nesterov=(opt == "nesterov"),
        )
    raise NotImplementedError(f"optimizer {opt}")
