from . import common, window, attention, conv, resize
