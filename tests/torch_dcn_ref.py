"""Pure-PyTorch DCNv2 with CharlesShang-CUDA semantics, for golden tests.

The reference's DLA neck builds every upsampling node from ``dcn_v2.DCN``
(an external CUDA extension, ``/root/reference/src/lib/model/networks/dla.py:
646-665``), which is absent in this environment (``DCN = None`` fallback at
dla.py:25-29).  This module re-implements the op exactly so the reference
``DLASeg`` can run its shipped-checkpoint configuration (``dla_node="dcn"``)
on CPU and serve as the golden for conversion + forward parity:

* parameter names/shapes match the CUDA module (``weight`` [Cout,Cin,3,3],
  ``bias``, ``conv_offset_mask.{weight,bias}`` predicting 3*K*K channels);
* the forward reproduces ``o1, o2, mask = chunk(out, 3); offset =
  cat((o1, o2)); mask = sigmoid(mask)`` — so the effective offset channel
  ``2k`` is the tap-k y-offset and ``2k+1`` the x-offset, exactly what the
  CUDA kernel (and deft_tpu.train.torch_convert) assume;
* bilinear sampling zeroes out-of-bounds neighbors per-corner (the CUDA
  ``dmcn_im2col_bilinear`` behavior).
"""

import torch
import torch.nn as nn


def _modulated_deform_conv(x, offset, mask, weight, bias, stride, padding,
                           dilation):
    """x: [B,Cin,H,W]; offset: [B,2*K*K,H',W'] (y,x interleaved per tap);
    mask: [B,K*K,H',W'] (sigmoided); weight: [Cout,Cin,kh,kw]."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    oh = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    ow = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    ys = torch.arange(oh, dtype=x.dtype) * stride - padding
    xs = torch.arange(ow, dtype=x.dtype) * stride - padding
    base_y = ys.view(1, oh, 1)
    base_x = xs.view(1, 1, ow)

    taps = []
    for t in range(kh * kw):
        ky, kx = divmod(t, kw)
        yy = base_y + ky * dilation + offset[:, 2 * t]       # [B, oh, ow]
        xx = base_x + kx * dilation + offset[:, 2 * t + 1]
        y0 = torch.floor(yy)
        x0 = torch.floor(xx)
        wy1 = yy - y0
        wx1 = xx - x0

        val = 0.0
        for dy, wy in ((0.0, 1.0 - wy1), (1.0, wy1)):
            for dx, wx in ((0.0, 1.0 - wx1), (1.0, wx1)):
                yi, xi = y0 + dy, x0 + dx
                inb = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
                yc = yi.clamp(0, h - 1).long()
                xc = xi.clamp(0, w - 1).long()
                flat = (yc * w + xc).view(b, 1, -1).expand(b, cin, -1)
                v = torch.gather(x.reshape(b, cin, -1), 2, flat)
                val = val + v.view(b, cin, oh, ow) * (
                    wy * wx * inb.to(x.dtype)).unsqueeze(1)
        taps.append(val * mask[:, t].unsqueeze(1))

    patches = torch.cat(taps, dim=1)                          # [B, KK*Cin, ...]
    # tap-major rows: weight [Cout, Cin, kh, kw] -> [Cout, KK*Cin]
    wk = weight.permute(0, 2, 3, 1).reshape(cout, kh * kw * cin)
    out = torch.einsum("bkhw,ok->bohw", patches, wk)
    return out + bias.view(1, cout, 1, 1)


class DCN(nn.Module):
    """Drop-in replacement for CharlesShang ``dcn_v2.DCN`` (CPU, exact)."""

    def __init__(self, chi, cho, kernel_size=(3, 3), stride=1, padding=1,
                 dilation=1, deformable_groups=1):
        super().__init__()
        assert deformable_groups == 1
        kh, kw = (kernel_size if isinstance(kernel_size, (tuple, list))
                  else (kernel_size, kernel_size))
        self.stride, self.padding, self.dilation = stride, padding, dilation
        self.kernel_size = (kh, kw)
        self.weight = nn.Parameter(torch.empty(cho, chi, kh, kw))
        self.bias = nn.Parameter(torch.zeros(cho))
        self.conv_offset_mask = nn.Conv2d(
            chi, 3 * kh * kw, kernel_size=(kh, kw), stride=stride,
            padding=padding, dilation=dilation, bias=True,
        )
        # CUDA-module init: kaiming-ish uniform main weight, ZERO offset conv
        n = chi * kh * kw
        stdv = 1.0 / (n ** 0.5)
        self.weight.data.uniform_(-stdv, stdv)
        self.conv_offset_mask.weight.data.zero_()
        self.conv_offset_mask.bias.data.zero_()

    def forward(self, x):
        out = self.conv_offset_mask(x)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        return _modulated_deform_conv(
            x, offset, mask, self.weight, self.bias,
            self.stride, self.padding, self.dilation,
        )
