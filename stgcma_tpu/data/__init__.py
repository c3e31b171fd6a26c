from . import transforms, datasets, loader
