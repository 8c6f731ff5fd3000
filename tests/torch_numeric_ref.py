"""Minimal torch implementations used ONLY as numeric oracles in tests.

These re-state the mathematical definitions of the window-attention and
gated-MLP blocks (as documented in SURVEY.md §2.1) so the JAX blocks can be
cross-checked with transplanted weights. Test-only; the framework itself has
no torch dependency.
"""

import numpy as np
import torch
import torch.nn.functional as F


def torch_wmsa(x_nhwc, qkv_w, qkv_b, proj_w, proj_b, rel_table, head_dim,
               window, shifted):
    """x: (B,H,W,C) numpy. Weights in torch layout: qkv_w (3C, C),
    proj_w (C, C), rel_table (heads, 2w-1, 2w-1)."""
    x = torch.from_numpy(np.asarray(x_nhwc)).float()
    B, H, W, C = x.shape
    heads = C // head_dim
    w = window
    if shifted:
        x = torch.roll(x, shifts=(-(w // 2), -(w // 2)), dims=(1, 2))
    nh, nw = H // w, W // w
    x = x.reshape(B, nh, w, nw, w, C).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, nh * nw, w * w, C)
    qkv = F.linear(x, torch.from_numpy(qkv_w).float(),
                   torch.from_numpy(qkv_b).float())
    # '(threeh c)' grouping: 3*heads groups of head_dim, chunked into q,k,v
    qkv = qkv.reshape(B, nh * nw, w * w, 3 * heads, head_dim)
    qkv = qkv.permute(3, 0, 1, 2, 4)  # (3h, B, N, P, d)
    q, k, v = qkv.chunk(3, dim=0)     # each (h, B, N, P, d)
    scale = head_dim ** -0.5
    sim = torch.einsum("hbwpc,hbwqc->hbwpq", q, k) * scale

    coords = np.array([[i, j] for i in range(w) for j in range(w)])
    rel = coords[:, None, :] - coords[None, :, :] + w - 1
    table = torch.from_numpy(rel_table).float()
    rel_emb = table[:, rel[:, :, 0], rel[:, :, 1]]  # (h, P, P)
    sim = sim + rel_emb[:, None, None, :, :]

    if shifted:
        p = w
        s = p - w // 2
        mask = torch.zeros(nh, nw, p, p, p, p, dtype=torch.bool)
        mask[-1, :, :s, :, s:, :] = True
        mask[-1, :, s:, :, :s, :] = True
        mask[:, -1, :, :s, :, s:] = True
        mask[:, -1, :, s:, :, :s] = True
        mask = mask.reshape(nh * nw, p * p, p * p)[None, None]
        sim = sim.masked_fill(mask, float("-inf"))  # (h,B,N,P,P) vs (1,1,N,P,P)

    probs = torch.softmax(sim, dim=-1)
    out = torch.einsum("hbwij,hbwjc->hbwic", probs, v)
    # merge heads head-major: (h,B,N,P,d) -> (B,N,P,h*d)
    h_, B_, N_, P_, d_ = out.shape
    out = out.permute(1, 2, 3, 0, 4).reshape(B_, N_, P_, h_ * d_)
    out = F.linear(out, torch.from_numpy(proj_w).float(),
                   torch.from_numpy(proj_b).float())
    out = out.reshape(B, nh, nw, w, w, C).permute(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, W, C)
    if shifted:
        out = torch.roll(out, shifts=(w // 2, w // 2), dims=(1, 2))
    return out.numpy()


def torch_conv_glu(x_nhwc, fc1_w, fc1_b, dw_w, dw_b, fc2_w, fc2_b):
    """ConvolutionalGLU oracle. fc1_w (2h, C); dw_w (h,1,3,3); fc2_w (out,h)."""
    x = torch.from_numpy(np.asarray(x_nhwc)).float()
    h = F.linear(x, torch.from_numpy(fc1_w).float(),
                 torch.from_numpy(fc1_b).float())
    g, v = h.chunk(2, dim=-1)
    g_nchw = g.permute(0, 3, 1, 2)
    g_nchw = F.conv2d(g_nchw, torch.from_numpy(dw_w).float(),
                      torch.from_numpy(dw_b).float(), padding=1,
                      groups=g_nchw.shape[1])
    g = g_nchw.permute(0, 2, 3, 1)
    out = F.gelu(g) * v
    out = F.linear(out, torch.from_numpy(fc2_w).float(),
                   torch.from_numpy(fc2_b).float())
    return out.numpy()
