"""IO: weight loading/conversion, tokenizer assets, native-lib bindings."""
