from .sampling import random_slice, random_projection, all_slices
