"""Attribute-access dict used for configs (stand-in for easydict.EasyDict).

The reference framework stores its whole config in an EasyDict
(`/root/reference/pcdet/config.py:66`).  We keep the same ergonomics but the
config object is *threaded explicitly* through the code instead of being a
global that modules mutate at import time.
"""


class EDict(dict):
    """dict with recursive attribute access: d.a.b == d['a']['b']."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, EDict):
            return EDict(v)
        if isinstance(v, (list, tuple)):
            return type(v)(EDict._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, EDict._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __delattr__(self, k):
        try:
            del self[k]
        except KeyError:
            raise AttributeError(k)

    def copy(self):
        return EDict(self)

    def __deepcopy__(self, memo):
        import copy
        return EDict({k: copy.deepcopy(v, memo) for k, v in self.items()})
