from . import metrics, markers, tf
