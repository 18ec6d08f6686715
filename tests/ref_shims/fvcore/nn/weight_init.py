"""fvcore.nn.weight_init shim: the two Caffe2-style initializers called
at module-construction time by the vendored detectron2 (fpn.py,
resnet.py, box_head.py, ...). Semantics per fvcore: xavier = kaiming
uniform with a=1, msra = kaiming normal fan_out/relu, bias zero."""

import torch.nn as nn


def c2_xavier_fill(module: nn.Module) -> None:
    nn.init.kaiming_uniform_(module.weight, a=1)
    if module.bias is not None:
        nn.init.constant_(module.bias, 0)


def c2_msra_fill(module: nn.Module) -> None:
    nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
    if module.bias is not None:
        nn.init.constant_(module.bias, 0)
