from . import torch_convert, io
