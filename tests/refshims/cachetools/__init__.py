"""cachetools shim with REAL caching (see README.md): the reference
leans on its LRU caches for metal correlations — without them a single
chi2 evaluation recomputes ~15 Pk->xi pipelines. Functional subset of
the real package: LRUCache with maxsize eviction, @cached with a key
function."""


class LRUCache(dict):
    def __init__(self, maxsize=128, **kwargs):
        super().__init__()
        self.maxsize = maxsize
        self._order = []

    def __setitem__(self, key, value):
        if key not in self:
            while len(self._order) >= self.maxsize:
                oldest = self._order.pop(0)
                dict.__delitem__(self, oldest)
            self._order.append(key)
        dict.__setitem__(self, key, value)

    def __delitem__(self, key):
        dict.__delitem__(self, key)
        self._order.remove(key)

    def clear(self):
        dict.clear(self)
        self._order = []


class Cache(LRUCache):
    pass


def _default_key(*args, **kwargs):
    from .keys import hashkey
    return hashkey(*args, **kwargs)


def cached(cache, key=_default_key, **_kwargs):
    def decorator(fn):
        def wrapper(*args, **kwargs):
            k = key(*args, **kwargs)
            try:
                return cache[k]
            except KeyError:
                pass
            except TypeError:       # unhashable key: skip caching
                return fn(*args, **kwargs)
            val = fn(*args, **kwargs)
            cache[k] = val
            return val
        wrapper.__wrapped__ = fn
        wrapper.cache = cache
        return wrapper
    return decorator


def cachedmethod(cache_getter, key=_default_key, **_kwargs):
    def decorator(fn):
        def wrapper(self, *args, **kwargs):
            cache = cache_getter(self)
            k = key(*args, **kwargs)
            try:
                return cache[k]
            except KeyError:
                pass
            except TypeError:
                return fn(self, *args, **kwargs)
            val = fn(self, *args, **kwargs)
            cache[k] = val
            return val
        wrapper.__wrapped__ = fn
        return wrapper
    return decorator
