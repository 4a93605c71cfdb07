"""GitPython import stub (used by the reference only for hash stamping)."""


class InvalidGitRepositoryError(Exception):
    pass


def Repo(*args, **kwargs):
    raise InvalidGitRepositoryError('git shim: no repository metadata')
