"""kornia.geometry.conversions shim. The reference's pose script imports
angle_axis_to_quaternion + QuaternionCoeffOrder but computes its
quaternions with its own Jazar-algorithm function — the shim only needs
to satisfy the import (and stay correct if ever called)."""

import enum

import torch


class QuaternionCoeffOrder(enum.Enum):
    XYZW = "xyzw"
    WXYZ = "wxyz"


def angle_axis_to_quaternion(angle_axis, order=QuaternionCoeffOrder.WXYZ):
    aa = torch.as_tensor(angle_axis, dtype=torch.float64)
    theta = torch.linalg.norm(aa, dim=-1, keepdim=True)
    half = theta * 0.5
    small = theta.squeeze(-1) < 1e-8
    k = torch.where(
        small.unsqueeze(-1), torch.full_like(theta, 0.5), torch.sin(half) / theta.clamp_min(1e-12)
    )
    w = torch.cos(half)
    xyz = aa * k
    if order == QuaternionCoeffOrder.WXYZ:
        return torch.cat([w, xyz], dim=-1)
    return torch.cat([xyz, w], dim=-1)
