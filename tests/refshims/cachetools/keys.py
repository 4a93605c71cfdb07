def hashkey(*args, **kwargs):
    return args + tuple(sorted(kwargs.items()))


def methodkey(self, *args, **kwargs):
    return hashkey(*args, **kwargs)
