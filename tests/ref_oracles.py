"""Test-only torch oracles transcribing the *reference formulas* verbatim.

These exist so the differential gates don't depend on a self-written
re-derivation that could share a misreading with the implementation under
test (round-1 verdict weak #6). Each function follows the cited reference
code path step by step in torch; they are used only by tests.

Sources studied:
  - eiou_loss: /root/reference/mmdet/models/losses/iou_loss.py:194-227
    (EIoULoss class defaults eps=1e-6, smooth_point=0.1, :533-544)
  - SimOTAAssigner._assign / get_in_gt_and_in_center_info /
    dynamic_k_matching:
    /root/reference/mmdet/core/bbox/assigners/sim_ota_assigner.py:95-257
  - bbox_overlaps union clamp:
    /root/reference/mmdet/core/bbox/iou_calculators/iou2d_calculator.py:
    75-253 (union = max(union, eps), eps=1e-6)
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def ref_eiou(pred: torch.Tensor, target: torch.Tensor,
             smooth_point: float = 0.1, eps: float = 1e-6) -> torch.Tensor:
    """Pre-reduction EIoU loss, (n,4) xyxy -> (n,). iou_loss.py:194-227."""
    px1, py1, px2, py2 = pred.unbind(-1)
    tx1, ty1, tx2, ty2 = target.unbind(-1)
    # extent top-left / intersection corners / "extra" corner combinations
    ex1, ey1 = torch.min(px1, tx1), torch.min(py1, ty1)
    ix1, iy1 = torch.max(px1, tx1), torch.max(py1, ty1)
    ix2, iy2 = torch.min(px2, tx2), torch.min(py2, ty2)
    xmin, ymin = torch.min(ix1, ix2), torch.min(iy1, iy2)
    xmax, ymax = torch.max(ix1, ix2), torch.max(iy1, iy2)
    intersection = ((ix2 - ex1) * (iy2 - ey1) + (xmin - ex1) * (ymin - ey1)
                    - (ix1 - ex1) * (ymax - ey1) - (xmax - ex1) * (iy1 - ey1))
    union = ((px2 - px1) * (py2 - py1) + (tx2 - tx1) * (ty2 - ty1)
             - intersection + eps)
    ious = 1 - (intersection / union)
    smooth_sign = (ious < smooth_point).detach().float()
    return (0.5 * smooth_sign * ious ** 2 / smooth_point
            + (1 - smooth_sign) * (ious - 0.5 * smooth_point))


def _ref_bbox_overlaps(b1: torch.Tensor, b2: torch.Tensor,
                       eps: float = 1e-6) -> torch.Tensor:
    """iou2d_calculator.py bbox_overlaps, mode='iou', is_aligned=False."""
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    overlap = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - overlap
    return overlap / torch.max(union, union.new_tensor([eps]))


def ref_simota(pred_scores: torch.Tensor, priors: torch.Tensor,
               decoded_bboxes: torch.Tensor, gt_bboxes: torch.Tensor,
               gt_labels: torch.Tensor, *, center_radius: float = 2.5,
               candidate_topk: int = 10, iou_weight: float = 3.0,
               cls_weight: float = 1.0, eps: float = 1e-7):
    """SimOTA assignment, sim_ota_assigner.py:95-257 step by step.

    Returns (assigned_gt_inds (P,) long with 0=bg / g+1=fg,
             max_overlaps (P,) float with matched IoU on fg rows).
    """
    INF = 100000.0
    num_gt = gt_bboxes.size(0)
    num_bboxes = decoded_bboxes.size(0)
    assigned_gt_inds = decoded_bboxes.new_zeros((num_bboxes,),
                                                dtype=torch.long)

    # --- get_in_gt_and_in_center_info (:186-228) ---
    x = priors[:, 0].unsqueeze(1).expand(-1, num_gt)
    y = priors[:, 1].unsqueeze(1).expand(-1, num_gt)
    sx = priors[:, 2].unsqueeze(1).expand(-1, num_gt)
    sy = priors[:, 3].unsqueeze(1).expand(-1, num_gt)
    deltas = torch.stack([x - gt_bboxes[:, 0], y - gt_bboxes[:, 1],
                          gt_bboxes[:, 2] - x, gt_bboxes[:, 3] - y], dim=1)
    is_in_gts = deltas.min(dim=1).values > 0
    gt_cxs = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0
    gt_cys = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0
    ct_deltas = torch.stack([x - (gt_cxs - center_radius * sx),
                             y - (gt_cys - center_radius * sy),
                             (gt_cxs + center_radius * sx) - x,
                             (gt_cys + center_radius * sy) - y], dim=1)
    is_in_cts = ct_deltas.min(dim=1).values > 0
    valid_mask = (is_in_gts.sum(dim=1) > 0) | (is_in_cts.sum(dim=1) > 0)
    is_in_boxes_and_center = (is_in_gts[valid_mask] & is_in_cts[valid_mask])

    valid_decoded_bbox = decoded_bboxes[valid_mask]
    valid_pred_scores = pred_scores[valid_mask]
    num_valid = valid_decoded_bbox.size(0)
    if num_gt == 0 or num_bboxes == 0 or num_valid == 0:
        return assigned_gt_inds, decoded_bboxes.new_zeros((num_bboxes,))

    # --- costs (:151-169) ---
    pairwise_ious = _ref_bbox_overlaps(valid_decoded_bbox, gt_bboxes)
    iou_cost = -torch.log(pairwise_ious + eps)
    gt_onehot = (F.one_hot(gt_labels.long(), pred_scores.shape[-1])
                 .float().unsqueeze(0).repeat(num_valid, 1, 1))
    vps = valid_pred_scores.unsqueeze(1).repeat(1, num_gt, 1)
    cls_cost = F.binary_cross_entropy(
        vps.float().sqrt_(), gt_onehot, reduction="none").sum(-1)
    cost = (cls_cost * cls_weight + iou_cost * iou_weight
            + (~is_in_boxes_and_center) * INF)

    # --- dynamic_k_matching (:230-257) ---
    matching = torch.zeros_like(cost, dtype=torch.uint8)
    k_cap = min(candidate_topk, pairwise_ious.size(0))
    topk_ious, _ = torch.topk(pairwise_ious, k_cap, dim=0)
    dynamic_ks = torch.clamp(topk_ious.sum(0).int(), min=1)
    for g in range(num_gt):
        _, pos = torch.topk(cost[:, g], k=int(dynamic_ks[g]), largest=False)
        matching[:, g][pos] = 1
    multi = matching.sum(1) > 1
    if multi.sum() > 0:
        _, argmin = torch.min(cost[multi, :], dim=1)
        matching[multi, :] *= 0
        matching[multi, argmin] = 1
    fg_inboxes = matching.sum(1) > 0
    valid_mask[valid_mask.clone()] = fg_inboxes
    matched_gt_inds = matching[fg_inboxes, :].argmax(1)
    matched_ious = (matching * pairwise_ious).sum(1)[fg_inboxes]

    assigned_gt_inds[valid_mask] = matched_gt_inds + 1
    max_overlaps = decoded_bboxes.new_zeros((num_bboxes,))
    max_overlaps[valid_mask] = matched_ious
    return assigned_gt_inds, max_overlaps
