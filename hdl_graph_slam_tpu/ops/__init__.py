from . import voxel, filters, knn, normals, ransac
