"""Exception types (parity with ``nexoclom/utilities/exceptions.py``)."""


class InputError(Exception):
    """Raised when an input file or parameter set is invalid."""

    def __init__(self, expression, message):
        self.expression = expression
        self.message = message
        super().__init__(f'{expression}: {message}')


class ConfigfileError(Exception):
    """Raised when the machine configuration file is invalid."""

    def __init__(self, configfile, message):
        self.configfile = configfile
        self.message = message
        super().__init__(f'{configfile}: {message}')
