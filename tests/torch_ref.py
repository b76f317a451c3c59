"""Test fixture: a minimal PyTorch twin of the MS-GCNet / MS-PSMNet
architectures, built clean-room from the architecture spec (SURVEY.md §2.2)
purely to validate our Flax models and the checkpoint converter against real
torch conv/deconv/BatchNorm semantics.

Module names deliberately reproduce the *published checkpoint key schema*
(e.g. ``block_3d_1.convbn_3d_2.0.weight``) so ``convert_state_dict`` can be
exercised on state_dicts generated here.
"""
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as tF


def _cbn(cin, cout, stride=1):
    return nn.Sequential(
        nn.Conv3d(cin, cout, 3, stride=stride, padding=1, bias=False),
        nn.BatchNorm3d(cout))


def _dbn(cin, cout):
    return nn.Sequential(
        nn.ConvTranspose3d(cin, cout, 3, stride=2, padding=1,
                           output_padding=1, bias=False),
        nn.BatchNorm3d(cout))


class TorchBlock3D(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.convbn_3d_1 = _cbn(cin, cout, stride)
        self.convbn_3d_2 = _cbn(cout, cout)
        self.convbn_3d_3 = _cbn(cout, cout)

    def forward(self, x):
        for m in (self.convbn_3d_1, self.convbn_3d_2, self.convbn_3d_3):
            x = tF.relu(m(x))
        return x


class TorchGCNet(nn.Module):
    """GCNet-style regularizer; forward takes [N, C, D, H, W], returns
    disparity [N, 2H, 2W]."""

    def __init__(self, max_disp=32, cin=8, F=32):
        super().__init__()
        self.max_disp = max_disp
        self.conv3dbn_1 = _cbn(cin, F)
        self.conv3dbn_2 = _cbn(F, F)
        self.block_3d_1 = TorchBlock3D(F, 2 * F, 2)
        self.block_3d_2 = TorchBlock3D(2 * F, 2 * F, 2)
        self.block_3d_3 = TorchBlock3D(2 * F, 2 * F, 2)
        self.block_3d_4 = TorchBlock3D(2 * F, 4 * F, 2)
        self.deconvbn1 = _dbn(4 * F, 2 * F)
        self.deconvbn2 = _dbn(2 * F, 2 * F)
        self.deconvbn3 = _dbn(2 * F, 2 * F)
        self.deconvbn4 = _dbn(2 * F, F)
        self.deconv5 = nn.ConvTranspose3d(F, 1, 3, stride=2, padding=1,
                                          output_padding=1)

    def forward(self, cv):
        x = tF.relu(self.conv3dbn_1(cv))
        x = tF.relu(self.conv3dbn_2(x))
        skips = [x]
        for blk in (self.block_3d_1, self.block_3d_2, self.block_3d_3):
            x = blk(x)
            skips.append(x)
        x = self.block_3d_4(x)
        for dec, skip in zip((self.deconvbn1, self.deconvbn2,
                              self.deconvbn3, self.deconvbn4),
                             reversed(skips)):
            x = tF.relu(dec(x) + skip)
        x = self.deconv5(x).squeeze(1)                    # [N, D, H, W]
        prob = tF.softmax(x, dim=1)
        d = torch.arange(self.max_disp, dtype=torch.float32).view(1, -1, 1, 1)
        return (prob * d).sum(1)


class TorchHourglass(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Sequential(_cbn(c, 2 * c, 2), nn.ReLU(inplace=True))
        self.conv2 = _cbn(2 * c, 2 * c)
        self.conv3 = nn.Sequential(_cbn(2 * c, 2 * c, 2), nn.ReLU(inplace=True))
        self.conv4 = nn.Sequential(_cbn(2 * c, 2 * c), nn.ReLU(inplace=True))
        self.conv5 = _dbn(2 * c, 2 * c)
        self.conv6 = _dbn(2 * c, c)

    def forward(self, x, presqu, postsqu):
        out = self.conv1(x)
        pre = self.conv2(out)
        pre = tF.relu(pre + postsqu) if postsqu is not None else tF.relu(pre)
        out = self.conv4(self.conv3(pre))
        post = tF.relu(self.conv5(out) + (presqu if presqu is not None else pre))
        return self.conv6(post), pre, post


class TorchPSMNet(nn.Module):
    """Stacked-hourglass regularizer (the *intended* MS-PSMNet, with the
    reference's defects fixed: 8-ch input, upsample sized from the volume)."""

    def __init__(self, max_disp=32, cin=8, upscale=2, F=32):
        super().__init__()
        self.max_disp = max_disp
        self.upscale = upscale
        self.dres0 = nn.Sequential(_cbn(cin, F), nn.ReLU(inplace=True),
                                   _cbn(F, F), nn.ReLU(inplace=True))
        self.dres1 = nn.Sequential(_cbn(F, F), nn.ReLU(inplace=True),
                                   _cbn(F, F))
        self.dres2 = TorchHourglass(F)
        self.dres3 = TorchHourglass(F)
        self.dres4 = TorchHourglass(F)

        def classifier():
            return nn.Sequential(_cbn(F, F), nn.ReLU(inplace=True),
                                 nn.Conv3d(F, 1, 3, padding=1, bias=False))
        self.classif1 = classifier()
        self.classif2 = classifier()
        self.classif3 = classifier()

    def forward(self, cv):
        N, C, D, H, W = cv.shape
        full = [self.max_disp, H * self.upscale, W * self.upscale]
        cost0 = self.dres0(cv)
        cost0 = self.dres1(cost0) + cost0
        out1, pre1, post1 = self.dres2(cost0, None, None)
        out1 = out1 + cost0
        out2, _, post2 = self.dres3(out1, pre1, post1)
        out2 = out2 + cost0
        out3, _, _ = self.dres4(out2, pre1, post2)
        out3 = out3 + cost0
        c1 = self.classif1(out1)
        c2 = self.classif2(out2) + c1
        c3 = self.classif3(out3) + c2

        def regress(c):
            c = tF.interpolate(c, full, mode="trilinear", align_corners=True)
            p = tF.softmax(c.squeeze(1), dim=1)
            d = torch.arange(self.max_disp, dtype=torch.float32).view(1, -1, 1, 1)
            return (p * d).sum(1)

        if self.training:
            return regress(c1), regress(c2), regress(c3)
        return regress(c3)
