from . import abx
