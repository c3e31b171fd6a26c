from . import adapters, swin, clip_vit, lstm, tpavi, decoder
