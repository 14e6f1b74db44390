"""torchvision.ops.boxes shim: box_convert (formats used by the
reference detection transforms: xyxy <-> cxcywh <-> xywh)."""
import torch


def _xyxy(boxes, fmt):
    if fmt == "xyxy":
        return boxes
    if fmt == "xywh":
        x, y, w, h = boxes.unbind(-1)
        return torch.stack((x, y, x + w, y + h), dim=-1)
    if fmt == "cxcywh":
        cx, cy, w, h = boxes.unbind(-1)
        return torch.stack(
            (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2), dim=-1
        )
    raise ValueError(f"unknown box format {fmt}")


def _from_xyxy(boxes, fmt):
    if fmt == "xyxy":
        return boxes
    x1, y1, x2, y2 = boxes.unbind(-1)
    if fmt == "xywh":
        return torch.stack((x1, y1, x2 - x1, y2 - y1), dim=-1)
    if fmt == "cxcywh":
        return torch.stack(
            ((x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1), dim=-1
        )
    raise ValueError(f"unknown box format {fmt}")


def box_convert(boxes, in_fmt, out_fmt):
    return _from_xyxy(_xyxy(boxes, in_fmt), out_fmt)
