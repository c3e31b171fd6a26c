from . import ave, avs, avqa
