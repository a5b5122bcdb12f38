"""Test-support utilities (torch reference twin, fixture helpers).

Importing this package does NOT import torch; submodules that need it
import it lazily so the production package stays torch-free.
"""
