from . import types, edges, robust, linearize, solver
from .types import GraphBuilder, GraphData, EdgeTable, EDGE_SPECS
from .solver import optimize, OptimizeStats
