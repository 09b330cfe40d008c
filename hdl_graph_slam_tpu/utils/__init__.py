from . import metrics, markers
