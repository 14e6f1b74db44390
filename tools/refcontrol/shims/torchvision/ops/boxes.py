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


def box_area(boxes):
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def box_iou(boxes1, boxes2):
    """Pairwise IoU on xyxy boxes -> (N, M)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union


def generalized_box_iou(boxes1, boxes2):
    """GIoU (Rezatofighi et al.) on xyxy boxes -> (N, M): IoU minus the
    normalized area of the smallest enclosing box outside the union."""
    iou = box_iou(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = torch.min(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = torch.max(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    enclose = wh[..., 0] * wh[..., 1]
    lt_i = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
    rb_i = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh_i = (rb_i - lt_i).clamp(min=0)
    inter = wh_i[..., 0] * wh_i[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return iou - (enclose - union) / enclose
