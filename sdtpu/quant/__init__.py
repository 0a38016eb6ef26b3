"""quant subsystem."""
