"""Format-plugin importers: OCR source files → canonical DataFrames.

Each plugin is, in Spark terms, a UDTF family (SURVEY §2.10): a pure
function from an issue directory to canonical issue + page rows, wrapped
in ``mapInPandas`` over the discovery DataFrame. Plugins register here:

    from impresso_ta.importers import register, get_plugin
"""

from impresso_ta.importers.base import (  # noqa: F401
    FormatPlugin,
    get_plugin,
    import_issues,
    register,
)
from impresso_ta.importers.base import ImportResult  # noqa: F401
from impresso_ta.importers import mets_alto as _mets_alto  # noqa: F401
from impresso_ta.importers import zip_archive as _zip_archive  # noqa: F401
from impresso_ta.importers import ina_asr as _ina_asr  # noqa: F401
from impresso_ta.importers import tetml as _tetml  # noqa: F401
from impresso_ta.importers import fedgaz as _fedgaz  # noqa: F401
from impresso_ta.importers import abbyy_bcul as _abbyy_bcul  # noqa: F401
from impresso_ta.importers import olive as _olive  # noqa: F401
from impresso_ta.importers import swa as _swa  # noqa: F401
from impresso_ta.importers import bnf_en as _bnf_en  # noqa: F401
from impresso_ta.importers import swissinfo as _swissinfo  # noqa: F401
