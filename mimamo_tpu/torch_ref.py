"""Torch-CPU twin forwards for ``cli convert --verify``.

The one parity gap that cannot be closed offline is an end-to-end check
against the actual PyTorch reference (SURVEY.md §0: the mount is empty
and the real ``.pth`` assets are unreachable). The mitigation protocol
(SURVEY §0 "verification protocol") is to make that check a one-command
gate the day assets land: ``convert --verify`` forward-runs the SOURCE
``state_dict`` under torch-CPU through the graphs reconstructed here
and compares against the converted Flax model on a fixed input,
printing max |Δ| per output (VERDICT round-3 missing item 1).

These twins consume the *source-convention* tensors directly (OIHW
convs, [O, I] linears, torch GRU gate layout, NCHW flatten before the
micro fc) — the exact layouts the importers in ``backbone.py`` /
``checkpoints.py`` transpose away — so a wrong transpose or key mapping
shows up as a large |Δ|, not a silent accuracy loss later.

torch is CPU-only in this image and the import is deferred, so nothing
here touches the TPU path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _torch():
    import torch
    return torch


# -- ResNet-50 FER+ backbone (torchvision state_dict naming) -------------


def _build_resnet(num_classes: int, stride_in_1x1: bool):
    torch = _torch()
    nn = torch.nn

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, width, stride):
            super().__init__()
            s1 = stride if stride_in_1x1 else 1
            s3 = 1 if stride_in_1x1 else stride
            self.conv1 = nn.Conv2d(inplanes, width, 1, stride=s1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride=s3,
                                   padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.relu = nn.ReLU()
            if stride != 1 or inplanes != width * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inplanes, width * 4, 1, stride=stride,
                              bias=False),
                    nn.BatchNorm2d(width * 4))
            else:
                self.downsample = None

        def forward(self, x):
            identity = (x if self.downsample is None
                        else self.downsample(x))
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + identity)

    class ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            inplanes = 64
            for i, (blocks, width) in enumerate(
                    zip((3, 4, 6, 3), (64, 128, 256, 512))):
                layer = []
                for b in range(blocks):
                    stride = 2 if (i > 0 and b == 0) else 1
                    layer.append(Bottleneck(inplanes, width, stride))
                    inplanes = width * 4
                setattr(self, f"layer{i + 1}", nn.Sequential(*layer))
            self.fc = nn.Linear(2048, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            emb = x.mean(dim=(2, 3))
            return emb, self.fc(emb)

    return ResNet50()


def backbone_forward(state_dict: Dict[str, np.ndarray],
                     images_nhwc: np.ndarray,
                     stride_in_1x1: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Forward SOURCE backbone tensors (canonical torchvision naming,
    source layouts) under torch-CPU.

    Args:
      state_dict: torchvision-named arrays — apply the dag rename /
        user rename map first, exactly as the importer does.
      images_nhwc: [N, S, S, 3] float32 already-preprocessed pixels
        (mean-subtracted; preprocessing conventions are out of scope —
        the check isolates WEIGHT conversion).

    Returns:
      (embeddings [N, 2048], logits [N, C]) as numpy.
    """
    torch = _torch()
    fc_w = state_dict["fc.weight"]
    model = _build_resnet(num_classes=int(np.asarray(fc_w).shape[0]),
                          stride_in_1x1=stride_in_1x1)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32)))
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    missing = [m for m in missing
               if not m.endswith("num_batches_tracked")]
    if missing or unexpected:
        raise KeyError(f"torch twin mismatch — missing: {missing[:5]}, "
                       f"unexpected: {list(unexpected)[:5]}")
    model.eval()
    with torch.no_grad():
        x = torch.from_numpy(
            np.ascontiguousarray(images_nhwc.transpose(0, 3, 1, 2)))
        emb, logits = model(x)
    return emb.numpy(), logits.numpy()


# -- Two-stream temporal model (canonical .pth schema) -------------------


def temporal_forward(state_dict: Dict[str, np.ndarray], spec,
                     phase_stacks: Optional[np.ndarray],
                     rgb_feats: Optional[np.ndarray],
                     num_frames: Optional[int] = None) -> np.ndarray:
    """Forward SOURCE two-stream tensors (canonical schema of
    ``checkpoints.load_temporal_state_dict`` — docs/WEIGHTS.md) under
    torch-CPU, mirroring ``temporal.TwoStreamRNN`` clip mode.

    Args:
      phase_stacks: [B, T-1, C, P, P] (NCHW maps, torch layout) or None
        for a macro-only spec.
      rgb_feats: [B, T, F] appearance features or None for micro-only.

    Returns:
      [B, T, num_outputs] numpy predictions.
    """
    torch = _torch()
    nn = torch.nn
    sd = {k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32))) for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")}
    use_micro = spec.streams in ("both", "micro")
    use_macro = spec.streams in ("both", "macro")
    if use_macro:
        b, t = rgb_feats.shape[:2]
    else:
        b, tm1 = phase_stacks.shape[:2]
        t = num_frames if num_frames is not None else tm1 + 1
    w = spec.snippet_len
    if w > 1 and t % w:
        raise ValueError(f"clip length {t} not divisible by "
                         f"snippet_len {w}")

    def take(prefix, module):
        sub = {k[len(prefix) + 1:]: v for k, v in sd.items()
               if k.startswith(prefix + ".")}
        missing, unexpected = module.load_state_dict(sub, strict=False)
        missing = [m for m in missing
                   if not m.endswith("num_batches_tracked")]
        if missing or unexpected:
            raise KeyError(
                f"{prefix}: torch twin mismatch — missing: "
                f"{missing[:5]}, unexpected: {list(unexpected)[:5]}")
        module.eval()
        return module

    def pool_snippets(x):                      # [B, T, D] -> [B, T/w, D]
        if w <= 1:
            return x
        return x.reshape(b, t // w, w, -1).mean(dim=2)

    outs = []
    with torch.no_grad():
        if use_micro:
            tm1 = phase_stacks.shape[1]
            c_in = phase_stacks.shape[2]
            p = phase_stacks.shape[-1]
            layers = []
            for feats in spec.micro_cnn_features:
                layers += [nn.Conv2d(c_in, feats, 3, padding=1,
                                     bias=False),
                           nn.BatchNorm2d(feats), nn.ReLU(),
                           nn.MaxPool2d(2, 2)]
                c_in = feats
                p //= 2
            cnn = nn.Sequential(*layers)
            # name the state_dict like the canonical schema: conv1/bn1
            # live at Sequential indices 0/1, conv2/bn2 at 4/5, ...
            cnn_sd = {}
            for i in range(len(spec.micro_cnn_features)):
                for src, dst in ((f"conv{i + 1}", f"{4 * i}"),
                                 (f"bn{i + 1}", f"{4 * i + 1}")):
                    for k, v in sd.items():
                        pref = f"micro_cnn.{src}."
                        if k.startswith(pref):
                            cnn_sd[f"{dst}.{k[len(pref):]}"] = v
            missing, unexpected = cnn.load_state_dict(cnn_sd,
                                                      strict=False)
            missing = [m for m in missing
                       if not m.endswith("num_batches_tracked")]
            if missing or unexpected:
                raise KeyError(f"micro_cnn: missing {missing[:5]}, "
                               f"unexpected {list(unexpected)[:5]}")
            cnn.eval()
            fc = take("micro_cnn.fc",
                      nn.Linear(c_in * p * p, spec.micro_embed_dim))
            x = torch.from_numpy(np.ascontiguousarray(
                phase_stacks.reshape((b * tm1,)
                                     + phase_stacks.shape[2:])))
            micro = fc(cnn(x).flatten(1)).reshape(b, tm1, -1)
            if tm1 == t - 1:                   # frame 0 has no pair
                micro = torch.cat(
                    [torch.zeros(b, 1, micro.shape[-1]), micro], dim=1)
            elif tm1 != t:
                raise ValueError(f"phase stacks T-1={tm1} vs T={t}")
            micro = pool_snippets(micro)
            gru_m = take("gru_micro",
                         nn.GRU(spec.micro_embed_dim, spec.gru_hidden,
                                num_layers=spec.gru_layers,
                                batch_first=True))
            ys, _ = gru_m(micro)
            outs.append(ys)
        if use_macro:
            proj = take("macro_proj",
                        nn.Linear(rgb_feats.shape[-1],
                                  spec.macro_embed_dim))
            macro = torch.relu(proj(torch.from_numpy(
                np.ascontiguousarray(rgb_feats, np.float32))))
            macro = pool_snippets(macro)
            gru_a = take("gru_macro",
                         nn.GRU(spec.macro_embed_dim, spec.gru_hidden,
                                num_layers=spec.gru_layers,
                                batch_first=True))
            ys, _ = gru_a(macro)
            outs.append(ys)
        fused = torch.cat(outs, dim=-1) if len(outs) > 1 else outs[0]
        fusion = take("fusion", nn.Linear(fused.shape[-1],
                                          spec.fusion_hidden))
        head = take("head", nn.Linear(spec.fusion_hidden,
                                      spec.num_outputs))
        out = head(torch.relu(fusion(fused)))
        if spec.output_activation == "tanh":
            out = torch.tanh(out)
        if w > 1:
            out = out.repeat_interleave(w, dim=1)
    return out.numpy()
