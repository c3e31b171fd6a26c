from . import stats
